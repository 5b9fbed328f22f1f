r"""EF-ConvLSTM (Shi et al.) — TPU-native.

Capability parity with
``vp_suite/models/precipitation_nowcasting/ef_conv_lstm.py:7-108``: the
Encoder-Forecaster stack with Shi ConvLSTM recurrent blocks; identical default
hyperparameters (intended for 64x64 inputs).
"""
from typing import Tuple

from vp_suite_tpu.model_blocks.conv_lstm_shi import ConvLSTMShi
from vp_suite_tpu.models.precipitation_nowcasting.ef_blocks import EncoderForecasterBase


class EF_ConvLSTM(EncoderForecasterBase):
    NAME = "EF-ConvLSTM (Shi et al.)"
    PAPER_REFERENCE = "https://arxiv.org/abs/1506.04214"
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

    enc_rnn_k: Tuple = (3, 3, 3)
    enc_rnn_s: Tuple = (1, 1, 1)
    enc_rnn_p: Tuple = (1, 1, 1)

    dec_rnn_k: Tuple = (3, 3, 3)
    dec_rnn_s: Tuple = (1, 1, 1)
    dec_rnn_p: Tuple = (1, 1, 1)

    final_conv_1_name: str = "identity"
    final_conv_1_c: int = 16
    final_conv_1_k: int = 3
    final_conv_1_s: int = 1
    final_conv_1_p: int = 1

    final_conv_2_name: str = "conv3_3"
    final_conv_2_k: int = 1
    final_conv_2_s: int = 1
    final_conv_2_p: int = 0

    use_pallas: bool = False  #: route cell gates through the fused Pallas kernel.
    use_fused_scan: bool = False  #: run each cell's whole recurrence as ONE
    #: Pallas kernel (differentiable; see ConvLSTMShi.use_fused_scan).
    remat_policy: str = "gates"  #: cell remat policy ('full' | 'gates'; 'gates' saves
    #: per-step gate pre-activations: ~5%% faster backward, more HBM).
    scan_unroll: int = 0  #: cell time-loop unroll; 0 = auto (full unroll for
    #: short sequences, see ``ConvLSTMShi.scan_unroll``).
    hoist_i2h: bool = False  #: batch the cells' input-half convs over time
    #: (see ``ConvLSTMShi.hoist_i2h``). Off by default: with auto-unrolled
    #: scans the per-step torch-style concat conv measured faster on the
    #: flagship bench (93.3 vs 94.5 ms) — the hoisted [t, b, sh, sw, 4enc]
    #: activations cost more HBM to stream than the conv costs to compute.

    def _build_encoder_decoder(self):
        r"""Assembles conv specs + ConvLSTM blocks per stage
        (parity: ``ef_conv_lstm.py:70-108``)."""
        layer_in_c = self.img_c
        enc_convs, enc_rnns = [], []
        for n in range(self.num_layers):
            layer_mid_c = self.enc_c[2 * n]
            layer_out_c = self.enc_c[2 * n + 1]
            enc_convs.append({
                self.enc_conv_names[n]: (layer_in_c, layer_mid_c, self.enc_conv_k[n],
                                         self.enc_conv_s[n], self.enc_conv_p[n])
            })
            enc_rnns.append(ConvLSTMShi(
                in_channels=layer_mid_c, enc_channels=layer_out_c,
                state_h=self.enc_rnn_state_h[n], state_w=self.enc_rnn_state_w[n],
                kernel_size=self.enc_rnn_k[n], stride=self.enc_rnn_s[n],
                padding=self.enc_rnn_p[n], use_pallas=self.use_pallas,
                remat_policy=self.remat_policy, scan_unroll=self.scan_unroll,
                hoist_i2h=self.hoist_i2h, use_fused_scan=self.use_fused_scan,
                time_major=True, name=f"enc_rnn{n+1}"))
            layer_in_c = layer_out_c

        dec_convs, dec_rnns = [], []
        for n in range(self.num_layers):
            layer_mid_c = self.dec_c[2 * n]
            layer_out_c = self.dec_c[2 * n + 1]
            dec_rnns.append(ConvLSTMShi(
                in_channels=layer_in_c, enc_channels=layer_mid_c,
                state_h=self.dec_rnn_state_h[n], state_w=self.dec_rnn_state_w[n],
                kernel_size=self.dec_rnn_k[n], stride=self.dec_rnn_s[n],
                padding=self.dec_rnn_p[n], use_pallas=self.use_pallas,
                remat_policy=self.remat_policy, scan_unroll=self.scan_unroll,
                hoist_i2h=self.hoist_i2h, use_fused_scan=self.use_fused_scan,
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
