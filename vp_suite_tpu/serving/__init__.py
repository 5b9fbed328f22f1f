from vp_suite_tpu.serving.export import (export_predictor, save_predictor,
                                         load_predictor)
