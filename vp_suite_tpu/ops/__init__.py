from vp_suite_tpu.ops.grid_sample import grid_sample, warp_flow
from vp_suite_tpu.ops.image import resize_bilinear, resize_video
from vp_suite_tpu.ops.patch import patchify, unpatchify
