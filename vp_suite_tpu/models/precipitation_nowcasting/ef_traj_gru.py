r"""EF-TrajGRU (Shi et al.) — TPU-native.

Capability parity with
``vp_suite/models/precipitation_nowcasting/ef_traj_gru.py:8-119``: the
Encoder-Forecaster stack with TrajGRU recurrent blocks (L=13 flow links).
"""
from typing import Tuple

from vp_suite_tpu.model_blocks.traj_gru import TrajGRU
from vp_suite_tpu.models.precipitation_nowcasting.ef_blocks import EncoderForecasterBase


class EF_TrajGRU(EncoderForecasterBase):
    NAME = "EF-TrajGRU (Shi et al.)"
    PAPER_REFERENCE = "https://arxiv.org/abs/1706.03458"
    CODE_REFERENCE = "https://github.com/Hzzone/Precipitation-Nowcasting"
    MATCHES_REFERENCE = "Yes"

    num_layers: int = 3
    enc_c: Tuple = (16, 64, 64, 96, 96, 96)
    dec_c: Tuple = (96, 96, 96, 96, 64, 16)

    enc_conv_names: Tuple = ("conv1_leaky_1", "conv2_leaky_1", "conv3_leaky_1")
    enc_conv_k: Tuple = (3, 3, 3)
    enc_conv_s: Tuple = (1, 2, 2)
    enc_conv_p: Tuple = (1, 1, 1)

    dec_conv_names: Tuple = ("deconv1_leaky_1", "deconv2_leaky_1", "deconv3_leaky_1")
    dec_conv_k: Tuple = (4, 4, 3)
    dec_conv_s: Tuple = (2, 2, 1)
    dec_conv_p: Tuple = (1, 1, 1)

    enc_rnn_z: Tuple = (0.0, 0.0, 0.0)
    enc_rnn_L: Tuple = (13, 13, 13)
    enc_rnn_i2h_k: Tuple = ((3, 3), (3, 3), (3, 3))
    enc_rnn_i2h_s: Tuple = ((1, 1), (1, 1), (1, 1))
    enc_rnn_i2h_p: Tuple = ((1, 1), (1, 1), (1, 1))
    enc_rnn_h2h_k: Tuple = ((5, 5), (5, 5), (3, 3))
    enc_rnn_h2h_d: Tuple = ((1, 1), (1, 1), (1, 1))

    dec_rnn_z: Tuple = (0.0, 0.0, 0.0)
    dec_rnn_L: Tuple = (13, 13, 13)
    dec_rnn_i2h_k: Tuple = ((3, 3), (3, 3), (3, 3))
    dec_rnn_i2h_s: Tuple = ((1, 1), (1, 1), (1, 1))
    dec_rnn_i2h_p: Tuple = ((1, 1), (1, 1), (1, 1))
    dec_rnn_h2h_k: Tuple = ((3, 3), (5, 5), (5, 5))
    dec_rnn_h2h_d: Tuple = ((1, 1), (1, 1), (1, 1))

    final_conv_1_name: str = "identity"
    final_conv_1_c: int = 16
    final_conv_1_k: int = 3
    final_conv_1_s: int = 1
    final_conv_1_p: int = 1

    final_conv_2_name: str = "conv3_3"
    final_conv_2_k: int = 1
    final_conv_2_s: int = 1
    final_conv_2_p: int = 0

    act_slope: float = 0.2
    scan_unroll: int = 1  #: cell time-loop unroll; 0 = auto (full for short seqs).

    def _per_layer_params(self):
        r"""Excludes the (kernel-size-tuple) rnn params from plain length
        checks handled by the base; all are still validated below."""
        return [(f, getattr(self, f)) for f in self.__dataclass_fields__
                if (f.startswith("enc_") or f.startswith("dec_"))]

    def _build_encoder_decoder(self):
        r"""Assembles conv specs + TrajGRU blocks per stage
        (parity: ``ef_traj_gru.py:77-119``)."""
        layer_in_c = self.img_c
        enc_convs, enc_rnns = [], []
        for n in range(self.num_layers):
            layer_mid_c = self.enc_c[2 * n]
            layer_out_c = self.enc_c[2 * n + 1]
            enc_convs.append({
                self.enc_conv_names[n]: (layer_in_c, layer_mid_c, self.enc_conv_k[n],
                                         self.enc_conv_s[n], self.enc_conv_p[n])
            })
            enc_rnns.append(TrajGRU(
                in_channels=layer_mid_c, enc_channels=layer_out_c,
                state_h=self.enc_rnn_state_h[n], state_w=self.enc_rnn_state_w[n],
                zoneout=self.enc_rnn_z[n], L=self.enc_rnn_L[n],
                i2h_kernel=self.enc_rnn_i2h_k[n], i2h_stride=self.enc_rnn_i2h_s[n],
                i2h_pad=self.enc_rnn_i2h_p[n], h2h_kernel=self.enc_rnn_h2h_k[n],
                h2h_dilate=self.enc_rnn_h2h_d[n], act_slope=self.act_slope,
                remat=self.remat, scan_unroll=self.scan_unroll,
                time_major=True, name=f"enc_rnn{n+1}"))
            layer_in_c = layer_out_c

        dec_convs, dec_rnns = [], []
        for n in range(self.num_layers):
            layer_mid_c = self.dec_c[2 * n]
            layer_out_c = self.dec_c[2 * n + 1]
            dec_rnns.append(TrajGRU(
                in_channels=layer_in_c, enc_channels=layer_mid_c,
                state_h=self.dec_rnn_state_h[n], state_w=self.dec_rnn_state_w[n],
                zoneout=self.dec_rnn_z[n], L=self.dec_rnn_L[n],
                i2h_kernel=self.dec_rnn_i2h_k[n], i2h_stride=self.dec_rnn_i2h_s[n],
                i2h_pad=self.dec_rnn_i2h_p[n], h2h_kernel=self.dec_rnn_h2h_k[n],
                h2h_dilate=self.dec_rnn_h2h_d[n], act_slope=self.act_slope,
                remat=self.remat, scan_unroll=self.scan_unroll,
                time_major=True, name=f"dec_rnn{n+1}"))
            dec_conv_dict = {
                self.dec_conv_names[n]: (layer_mid_c, layer_out_c, self.dec_conv_k[n],
                                         self.dec_conv_s[n], self.dec_conv_p[n])
            }
            if n == self.num_layers - 1:
                dec_conv_dict[self.final_conv_1_name] = (
                    layer_out_c, self.final_conv_1_c, self.final_conv_1_k,
                    self.final_conv_1_s, self.final_conv_1_p)
                dec_conv_dict[self.final_conv_2_name] = (
                    self.final_conv_1_c, self.img_c, self.final_conv_2_k,
                    self.final_conv_2_s, self.final_conv_2_p)
            dec_convs.append(dec_conv_dict)
            layer_in_c = layer_out_c
        return enc_convs, enc_rnns, dec_convs, dec_rnns
