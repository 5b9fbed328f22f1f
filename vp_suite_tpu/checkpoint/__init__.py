from vp_suite_tpu.checkpoint.checkpoint import (
    save_checkpoint, load_checkpoint, model_from_config)
