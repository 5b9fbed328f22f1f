r"""Model block registry (parity: ``vp_suite/model_blocks/__init__.py:9-23``)."""
from vp_suite_tpu.model_blocks.conv_lstm_shi import ConvLSTMShi
from vp_suite_tpu.model_blocks.conv_lstm_ndrplz import (
    ConvLSTMNdrplz, ConvLSTMCellNdrplz, convlstm_ndrplz_gates)
from vp_suite_tpu.model_blocks.traj_gru import TrajGRU, conv_rnn_state_size
from vp_suite_tpu.model_blocks.predrnn import make_st_lstm_cell
from vp_suite_tpu.model_blocks.phydnet import (
    make_phycell_cell, k2m, k2m_matrices, moment_loss, moment_constraints,
    find_divisor_for_group_norm)
from vp_suite_tpu.model_blocks.conv import (
    DoubleConv2d, DoubleConv3d, DCGANConv, DCGANConvTranspose)
from vp_suite_tpu.model_blocks.enc import (
    Autoencoder, Encoder, Decoder, DCGANEncoder, DCGANDecoder,
    EncoderSplit, DecoderSplit)

MODEL_BLOCK_CLASSES = [
    ConvLSTMShi,
    ConvLSTMNdrplz,
    TrajGRU,
    DoubleConv2d,
    DoubleConv3d,
    DCGANConv,
    DCGANConvTranspose,
    Autoencoder,
    Encoder,
    Decoder,
    DCGANEncoder,
    DCGANDecoder,
]
