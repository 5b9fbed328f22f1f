from vp_suite_tpu.nn.layers import (
    Conv2d, ConvTranspose2d, Conv3d, Dense, GroupNorm, LayerNormCHW,
    BatchNorm, max_pool_2d, max_pool_3d, torch_kernel_init, torch_bias_init,
    leaky_relu, same_pad,
)
