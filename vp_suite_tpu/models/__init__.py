r"""Model registry (parity: ``vp_suite/models/__init__.py:14-28``; the extra
``min-conv-rnn`` key is a TPU-native time-parallel model with no reference
analog — see ``models/min_conv_rnn.py``)."""
from vp_suite_tpu.models.copy_last_frame import CopyLastFrame
from vp_suite_tpu.models.lstm import LSTM
from vp_suite_tpu.models.unet3d import UNet3D
from vp_suite_tpu.models.phydnet import PhyDNet
from vp_suite_tpu.models.st_phy import STPhy
from vp_suite_tpu.models.predrnn_v2 import PredRNN_V2
from vp_suite_tpu.models.precipitation_nowcasting.ef_conv_lstm import EF_ConvLSTM
from vp_suite_tpu.models.precipitation_nowcasting.ef_traj_gru import EF_TrajGRU
from vp_suite_tpu.models.min_conv_rnn import MinConvRNN
from vp_suite_tpu.models.pred_former import PredFormer
from vp_suite_tpu.models.simvp import SimVP

MODEL_CLASSES = {
    "copy": CopyLastFrame,
    "lstm": LSTM,
    "unet-3d": UNet3D,
    "phy": PhyDNet,
    "st-phy": STPhy,
    "convlstm-shi": EF_ConvLSTM,
    "trajgru": EF_TrajGRU,
    "predrnn-pp": PredRNN_V2,
    "min-conv-rnn": MinConvRNN,  # TPU-native extra (no reference analog)
    "pred-former": PredFormer,   # TPU-native extra (no reference analog)
    "simvp": SimVP,              # TPU-native extra (no reference analog)
}
AVAILABLE_MODELS = MODEL_CLASSES.keys()
