from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.base.base_dataset import VPDataset, VPData, VPSubset
from vp_suite_tpu.base.base_measure import VPMeasure
from vp_suite_tpu.base.base_model_block import VPModelBlock
