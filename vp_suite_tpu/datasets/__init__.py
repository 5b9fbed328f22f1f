r"""Dataset registry (parity: ``vp_suite/datasets/__init__.py:15-26``)."""
from vp_suite_tpu.datasets.mmnist import MovingMNISTDataset
from vp_suite_tpu.datasets.mmnist_on_the_fly import MovingMNISTOnTheFly
from vp_suite_tpu.datasets.bair import BAIRPushingDataset
from vp_suite_tpu.datasets.kth import KTHActionsDataset
from vp_suite_tpu.datasets.synpick import SynpickMovingDataset
from vp_suite_tpu.datasets.physics101 import Physics101Dataset
from vp_suite_tpu.datasets.human36m import Human36MDataset
from vp_suite_tpu.datasets.kitti_raw import KITTIRawDataset
from vp_suite_tpu.datasets.caltech_pedestrian import CaltechPedestrianDataset

DATASET_CLASSES = {
    "MM": MovingMNISTDataset,
    "MMF": MovingMNISTOnTheFly,
    "BAIR": BAIRPushingDataset,
    "KTH": KTHActionsDataset,
    "SPM": SynpickMovingDataset,
    "P101": Physics101Dataset,
    "H36M": Human36MDataset,
    "KITTI": KITTIRawDataset,
    "CP": CaltechPedestrianDataset,
}
AVAILABLE_DATASETS = DATASET_CLASSES.keys()
