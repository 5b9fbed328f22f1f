from vp_suite_tpu.native.build import load_mmnist_gen, native_available
