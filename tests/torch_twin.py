# -*- coding: utf-8 -*-
"""Torch twin of the Kokoro-class stack, with kokoro-style state_dict names.

Purpose (VERDICT r1 next-#2): the real Kokoro checkpoint is unreachable in
this zero-egress environment, so converter correctness is proven against a
*torch twin* — a PyTorch model with the same architecture and the reference
package's parameter naming conventions (``bert`` = transformers AlbertModel,
``predictor.text_encoder.lstms.{0,2,4}`` = nn.LSTM, weight-normed convs,
``decoder.generator.resblocks.{n}`` ...; call surface per reference
src/illufly_tts/core/kmodel.py:70-144). ``convert_checkpoint`` must map the
twin's state_dict to the Flax tree with zero unmapped tensors, and the two
models must agree numerically layer-by-layer and end-to-end. Divergences
from the real upstream package are deliberate and documented inline:

- STFT head: center=False frames + right reflect-pad (the upstream uses
  torch.stft(center=True) plus a ReflectionPad1d((1, 0)) — same content,
  one-frame edge difference). Twin mirrors ours so audio compares exactly.
- Source module noise: deterministic (no random phase/noise at inference).
- exp() magnitude is clipped to [-12, 8] for bf16 safety; real checkpoints
  operate inside that range.

All modules here are REAL torch modules (nn.LSTM, nn.InstanceNorm1d,
weight_norm, F.conv1d, transformers AlbertModel), so this also validates the
Flax layer math (LSTM gate order + pack semantics, masked AdaIN, transposed
conv geometry, snake blocks) against PyTorch ground truth.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn
from torch.nn.utils import weight_norm

from illufly_tts_tpu.ops.stft import _bases, hann
from illufly_tts_tpu.model.config import KokoroConfig


class LinearNorm(nn.Module):
    """StyleTTS2 LinearNorm: a Linear under the 'linear_layer' name."""

    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.linear_layer = nn.Linear(in_dim, out_dim)

    def forward(self, x):
        return self.linear_layer(x)


class AdaLayerNorm(nn.Module):
    def __init__(self, style_dim, channels, eps=1e-5):
        super().__init__()
        self.channels = channels
        self.eps = eps
        self.fc = nn.Linear(style_dim, channels * 2)

    def forward(self, x, s):  # x [B,T,C]
        h = self.fc(s)
        gamma, beta = torch.chunk(h, 2, dim=-1)
        x = F.layer_norm(x, (self.channels,), eps=self.eps)
        return (1 + gamma.unsqueeze(1)) * x + beta.unsqueeze(1)


class AdaIN1d(nn.Module):
    def __init__(self, style_dim, channels):
        super().__init__()
        self.norm = nn.InstanceNorm1d(channels, affine=False)
        self.fc = nn.Linear(style_dim, channels * 2)

    def forward(self, x, s):  # x [B,C,T]
        h = self.fc(s).unsqueeze(-1)
        gamma, beta = torch.chunk(h, 2, dim=1)
        return (1 + gamma) * self.norm(x) + beta


class AdainResBlk1d(nn.Module):
    """StyleTTS2 AdainResBlk1d (channels-first)."""

    def __init__(self, dim_in, dim_out, style_dim, upsample=False):
        super().__init__()
        self.upsample = upsample
        self.learned_sc = dim_in != dim_out
        self.actv = nn.LeakyReLU(0.2)
        self.norm1 = AdaIN1d(style_dim, dim_in)
        self.norm2 = AdaIN1d(style_dim, dim_out)
        self.conv1 = weight_norm(nn.Conv1d(dim_in, dim_out, 3, padding=1))
        self.conv2 = weight_norm(nn.Conv1d(dim_out, dim_out, 3, padding=1))
        if self.learned_sc:
            self.conv1x1 = weight_norm(
                nn.Conv1d(dim_in, dim_out, 1, bias=False)
            )
        if upsample:
            self.pool = weight_norm(
                nn.ConvTranspose1d(
                    dim_in, dim_in, 3, stride=2, groups=dim_in,
                    padding=1, output_padding=1,
                )
            )

    def _shortcut(self, x):
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        if self.learned_sc:
            x = self.conv1x1(x)
        return x

    def _residual(self, x, s):
        x = self.norm1(x, s)
        x = self.actv(x)
        if self.upsample:
            x = self.pool(x)
        x = self.conv1(x)
        x = self.norm2(x, s)
        x = self.actv(x)
        x = self.conv2(x)
        return x

    def forward(self, x, s):
        return (self._residual(x, s) + self._shortcut(x)) / math.sqrt(2)


class AdaINResBlock1(nn.Module):
    """iSTFTNet generator residual block (snake + AdaIN, channels-first)."""

    def __init__(self, channels, kernel, dilations, style_dim):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(
                channels, channels, kernel, dilation=d,
                padding=((kernel - 1) * d) // 2,
            ))
            for d in dilations
        ])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(
                channels, channels, kernel, padding=(kernel - 1) // 2
            ))
            for _ in dilations
        ])
        self.adain1 = nn.ModuleList(
            [AdaIN1d(style_dim, channels) for _ in dilations]
        )
        self.adain2 = nn.ModuleList(
            [AdaIN1d(style_dim, channels) for _ in dilations]
        )
        self.alpha1 = nn.ParameterList(
            [nn.Parameter(torch.ones(1, channels, 1)) for _ in dilations]
        )
        self.alpha2 = nn.ParameterList(
            [nn.Parameter(torch.ones(1, channels, 1)) for _ in dilations]
        )

    def forward(self, x, s):
        for c1, c2, n1, n2, a1, a2 in zip(
            self.convs1, self.convs2, self.adain1, self.adain2,
            self.alpha1, self.alpha2,
        ):
            xt = n1(x, s)
            xt = xt + (1.0 / a1) * torch.sin(a1 * xt) ** 2
            xt = c1(xt)
            xt = n2(xt, s)
            xt = xt + (1.0 / a2) * torch.sin(a2 * xt) ** 2
            xt = c2(xt)
            x = xt + x
        return x


class DurationEncoder(nn.Module):
    """predictor.text_encoder: interleaved BiLSTM / AdaLayerNorm stack."""

    def __init__(self, sty_dim, d_model, nlayers=3):
        super().__init__()
        blocks = []
        for _ in range(nlayers):
            blocks.append(nn.LSTM(
                d_model + sty_dim, d_model // 2, 1,
                batch_first=True, bidirectional=True,
            ))
            blocks.append(AdaLayerNorm(sty_dim, d_model))
        self.lstms = nn.ModuleList(blocks)

    def forward(self, x, style):  # x [B,T,d_model] (full-valid mask)
        s = style.unsqueeze(1).expand(-1, x.shape[1], -1)
        for block in self.lstms:
            if isinstance(block, AdaLayerNorm):
                x = block(x, style)
            else:
                x = torch.cat([x, s], dim=-1)
                x, _ = block(x)
        return torch.cat([x, s], dim=-1)


class ProsodyPredictor(nn.Module):
    def __init__(self, cfg: KokoroConfig):
        super().__init__()
        h, s = cfg.hidden_dim, cfg.style_dim
        self.text_encoder = DurationEncoder(s, h)
        self.lstm = nn.LSTM(h + s, h // 2, 1, batch_first=True,
                            bidirectional=True)
        self.duration_proj = LinearNorm(h, cfg.max_dur)
        self.shared = nn.LSTM(h + s, h // 2, 1, batch_first=True,
                              bidirectional=True)
        self.F0 = nn.ModuleList([
            AdainResBlk1d(h, h, s),
            AdainResBlk1d(h, h // 2, s, upsample=True),
            AdainResBlk1d(h // 2, h // 2, s),
        ])
        self.N = nn.ModuleList([
            AdainResBlk1d(h, h, s),
            AdainResBlk1d(h, h // 2, s, upsample=True),
            AdainResBlk1d(h // 2, h // 2, s),
        ])
        self.F0_proj = nn.Conv1d(h // 2, 1, 1)
        self.N_proj = nn.Conv1d(h // 2, 1, 1)

    def encode_durations(self, d_en, style, speed=1.0):
        d = self.text_encoder(d_en, style)
        x, _ = self.lstm(d)
        duration = torch.sigmoid(self.duration_proj(x)).sum(-1) / speed
        return duration, d

    def f0n_train(self, en, style):  # en [B,F,h+s]
        x, _ = self.shared(en)
        x = x.transpose(1, 2)  # [B,h,F]
        f0 = x
        for block in self.F0:
            f0 = block(f0, style)
        f0 = self.F0_proj(f0)
        n = x
        for block in self.N:
            n = block(n, style)
        n = self.N_proj(n)
        return f0.squeeze(1), n.squeeze(1)


class ChannelLayerNorm(nn.Module):
    """StyleTTS2 LayerNorm over the channel dim of [B,C,T] (gamma/beta)."""

    def __init__(self, channels, eps=1e-5):
        super().__init__()
        self.channels = channels
        self.eps = eps
        self.gamma = nn.Parameter(torch.ones(channels))
        self.beta = nn.Parameter(torch.zeros(channels))

    def forward(self, x):  # [B,C,T]
        x = x.transpose(1, -1)
        x = F.layer_norm(x, (self.channels,), self.gamma, self.beta,
                         self.eps)
        return x.transpose(1, -1)


class TextEncoder(nn.Module):
    def __init__(self, cfg: KokoroConfig):
        super().__init__()
        h, k = cfg.hidden_dim, cfg.text_encoder_kernel_size
        self.embedding = nn.Embedding(cfg.n_token, h)
        self.cnn = nn.ModuleList([
            nn.Sequential(
                weight_norm(nn.Conv1d(h, h, k, padding=k // 2)),
                ChannelLayerNorm(h),
            )
            for _ in range(cfg.n_layer)
        ])
        self.lstm = nn.LSTM(h, h // 2, 1, batch_first=True,
                            bidirectional=True)

    def forward(self, input_ids):  # full-valid mask
        x = self.embedding(input_ids).transpose(1, 2)  # [B,h,T]
        for block in self.cnn:
            x = block(x)
            x = F.leaky_relu(x, 0.2)
        x = x.transpose(1, 2)
        x, _ = self.lstm(x)
        return x  # [B,T,h]


class SourceModuleHnNSF(nn.Module):
    """Deterministic harmonic source; l_linear merges harmonics."""

    def __init__(self, sample_rate, harmonics=8, sine_amp=0.1,
                 voiced_threshold=10.0):
        super().__init__()
        self.sample_rate = sample_rate
        self.harmonics = harmonics
        self.sine_amp = sine_amp
        self.voiced_threshold = voiced_threshold
        self.l_linear = nn.Linear(harmonics + 1, 1)

    def forward(self, f0_up):  # [B, L] Hz per sample
        h = torch.arange(1, self.harmonics + 2, dtype=torch.float32)
        rad = torch.cumsum(f0_up / self.sample_rate, dim=-1)
        phase = 2.0 * math.pi * rad.unsqueeze(-1) * h
        uv = (f0_up > self.voiced_threshold).float().unsqueeze(-1)
        sines = self.sine_amp * torch.sin(phase) * uv
        return torch.tanh(self.l_linear(sines)).squeeze(-1)


def _stft_magphase(x, n_fft, hop):
    """Mirror of ops/stft.py stft_magphase (center=False, hann)."""
    fwd_cos, fwd_sin, _, _ = _bases(n_fft)
    win = torch.from_numpy(hann(n_fft).astype(np.float32))
    frames = x.unfold(-1, n_fft, hop) * win  # [B,F,n_fft]
    re = frames @ torch.from_numpy(fwd_cos.T)
    im = frames @ torch.from_numpy(fwd_sin.T)
    mag = torch.sqrt(re * re + im * im + 1e-9)
    # mirror ops/stft.py: canonicalize -0.0 so the atan2 branch at +/-pi
    # is deterministic across backends
    im = torch.where(im == 0.0, torch.zeros_like(im), im)
    phase = torch.atan2(im, re)
    return mag, phase


def _istft(mag, phase, n_fft, hop):
    """Mirror of ops/stft.py istft (overlap-add + window-envelope norm)."""
    _, _, inv_cos, inv_sin = _bases(n_fft)
    re = mag * torch.cos(phase)
    im = mag * torch.sin(phase)
    frames = re @ torch.from_numpy(inv_cos) + im @ torch.from_numpy(inv_sin)
    win = torch.from_numpy(hann(n_fft).astype(np.float32))
    frames = frames * win
    batch, num_frames, _ = frames.shape
    out_len = (num_frames - 1) * hop + n_fft
    audio = torch.zeros(batch, out_len)
    env = torch.zeros(1, out_len)
    win2 = (win * win).expand(num_frames, n_fft)
    for f in range(num_frames):
        audio[:, f * hop: f * hop + n_fft] += frames[:, f]
        env[:, f * hop: f * hop + n_fft] += win2[f]
    return audio / torch.clamp(env, min=1e-8)


class Generator(nn.Module):
    def __init__(self, cfg: KokoroConfig, in_channels=512):
        super().__init__()
        g = cfg.istftnet
        self.cfg = cfg
        self.num_upsamples = len(g.upsample_rates)
        self.num_kernels = len(g.resblock_kernel_sizes)
        self.n_fft, self.hop = g.gen_istft_n_fft, g.gen_istft_hop_size
        ch = g.upsample_initial_channel
        self.up_total = 1
        for u in g.upsample_rates:
            self.up_total *= u
        self.m_source = SourceModuleHnNSF(cfg.sample_rate)
        self.ups = nn.ModuleList()
        self.noise_convs = nn.ModuleList()
        self.noise_res = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        for i, (u, k) in enumerate(
            zip(g.upsample_rates, g.upsample_kernel_sizes)
        ):
            c_in = in_channels if i == 0 else ch // (2 ** i)
            c_cur = ch // (2 ** (i + 1))
            self.ups.append(weight_norm(nn.ConvTranspose1d(
                c_in, c_cur, k, u, padding=(k - u) // 2
            )))
            if i + 1 < self.num_upsamples:
                stride_f0 = 1
                for r in g.upsample_rates[i + 1:]:
                    stride_f0 *= r
                self.noise_convs.append(nn.Conv1d(
                    self.n_fft + 2, c_cur, kernel_size=stride_f0 * 2,
                    stride=stride_f0, padding=(stride_f0 + 1) // 2,
                ))
                self.noise_res.append(AdaINResBlock1(
                    c_cur, 7, (1, 3, 5), cfg.style_dim
                ))
            else:
                self.noise_convs.append(nn.Conv1d(
                    self.n_fft + 2, c_cur, kernel_size=1
                ))
                self.noise_res.append(AdaINResBlock1(
                    c_cur, 11, (1, 3, 5), cfg.style_dim
                ))
            for kr, dr in zip(
                g.resblock_kernel_sizes, g.resblock_dilation_sizes
            ):
                self.resblocks.append(AdaINResBlock1(
                    c_cur, kr, tuple(dr), cfg.style_dim
                ))
        self.conv_post = weight_norm(nn.Conv1d(
            ch // (2 ** self.num_upsamples), self.n_fft + 2, 7, padding=3
        ))

    def forward(self, x, s, f0):  # x [B,C,2F], f0 [B,2F]
        samples_per_in = self.up_total * self.hop
        f0_up = f0.repeat_interleave(samples_per_in, dim=1)
        har = self.m_source(f0_up)
        har = F.pad(
            har.unsqueeze(1), (0, self.n_fft - self.hop), mode="reflect"
        ).squeeze(1)
        mag, ph = _stft_magphase(har, self.n_fft, self.hop)
        har_spec = torch.cat([mag, ph], dim=-1).transpose(1, 2)  # [B,2K,Fr]

        for i in range(self.num_upsamples):
            x = F.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            x_src = self.noise_convs[i](har_spec)
            x_src = self.noise_res[i](x_src, s)
            x = x + x_src
            xs = None
            for j in range(self.num_kernels):
                out = self.resblocks[i * self.num_kernels + j](x, s)
                xs = out if xs is None else xs + out
            x = xs / self.num_kernels

        x = F.leaky_relu(x, 0.01)
        x = self.conv_post(x)  # [B, n_fft+2, L]
        x = x.transpose(1, 2)
        k = self.n_fft // 2 + 1
        mag = torch.exp(torch.clamp(x[..., :k], -12.0, 8.0))
        phase = math.pi * torch.sin(x[..., k:])
        audio = _istft(mag, phase, self.n_fft, self.hop)
        return audio[:, : x.shape[1] * self.hop]


class Decoder(nn.Module):
    def __init__(self, cfg: KokoroConfig):
        super().__init__()
        h, s = cfg.hidden_dim, cfg.style_dim
        self.F0_conv = weight_norm(nn.Conv1d(1, 1, 3, stride=2, padding=1))
        self.N_conv = weight_norm(nn.Conv1d(1, 1, 3, stride=2, padding=1))
        self.encode = AdainResBlk1d(h + 2, 1024, s)
        self.asr_res = nn.Sequential(weight_norm(nn.Conv1d(h, 64, 1)))
        self.decode = nn.ModuleList([
            AdainResBlk1d(1024 + 2 + 64, 1024, s),
            AdainResBlk1d(1024 + 2 + 64, 1024, s),
            AdainResBlk1d(1024 + 2 + 64, 1024, s),
            AdainResBlk1d(1024 + 2 + 64, 512, s, upsample=True),
        ])
        self.generator = Generator(cfg, in_channels=512)

    def forward(self, asr, f0_curve, n_curve, s):  # asr [B,F,h]
        asr = asr.transpose(1, 2)
        f0 = self.F0_conv(f0_curve.unsqueeze(1))
        n = self.N_conv(n_curve.unsqueeze(1))
        x = torch.cat([asr, f0, n], dim=1)
        x = self.encode(x, s)
        asr_res = self.asr_res(asr)
        res = True
        for block in self.decode:
            if res:
                x = torch.cat([x, asr_res, f0, n], dim=1)
            x = block(x, s)
            if block.upsample:
                res = False
        return self.generator(x, s, f0_curve)


class TwinKModel(nn.Module):
    """Full twin; forward mirrors KokoroModel.__call__ on full-valid masks."""

    def __init__(self, cfg: KokoroConfig):
        super().__init__()
        from transformers import AlbertConfig as HFAlbertConfig
        from transformers import AlbertModel

        a = cfg.albert
        self.cfg = cfg
        self.bert = AlbertModel(HFAlbertConfig(
            vocab_size=a.vocab_size,
            embedding_size=a.embedding_size,
            hidden_size=a.hidden_size,
            num_attention_heads=a.num_heads,
            intermediate_size=a.intermediate_size,
            num_hidden_layers=a.num_layers,
            max_position_embeddings=a.max_position,
            # gelu_new (tanh approx): the HF AlbertConfig default the
            # real PLBERT uses — keeps the parity test non-circular
            hidden_act="gelu_new",
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            classifier_dropout_prob=0.0,
            attn_implementation="eager",
        ))
        self.bert_encoder = nn.Linear(a.hidden_size, cfg.hidden_dim)
        self.predictor = ProsodyPredictor(cfg)
        self.text_encoder = TextEncoder(cfg)
        self.decoder = Decoder(cfg)
        self.eval()

    @torch.no_grad()
    def encode_durations(self, input_ids, ref_s, speed=1.0):
        cfg = self.cfg
        mask = torch.ones_like(input_ids)
        style = ref_s[:, cfg.style_split:]
        bert_out = self.bert(
            input_ids, attention_mask=mask
        ).last_hidden_state
        d_en = self.bert_encoder(bert_out)
        return self.predictor.encode_durations(d_en, style, speed)

    @staticmethod
    def fit_durations(pred_dur, budget):
        """Mirror of kokoro.py _fit_durations."""
        cum_prev = torch.cumsum(pred_dur, -1) - pred_dur
        return torch.clamp(budget - cum_prev, torch.zeros_like(pred_dur),
                           pred_dur)

    @staticmethod
    def expand(features, durations, num_frames):
        """Reference-style per-item repeat_interleave alignment
        (reference kmodel.py:108-125); frames beyond the total clamp to the
        last token like ops/align.py."""
        batch, t_len, _ = features.shape
        out = []
        for b in range(batch):
            idx = torch.repeat_interleave(
                torch.arange(t_len), durations[b]
            )[:num_frames]
            if idx.numel() < num_frames:
                pad = torch.full((num_frames - idx.numel(),), t_len - 1,
                                 dtype=torch.long)
                idx = torch.cat([idx, pad])
            out.append(features[b, idx])
        return torch.stack(out)

    @torch.no_grad()
    def decode_frames(self, input_ids, d, pred_dur, ref_s, num_frames):
        cfg = self.cfg
        style = ref_s[:, cfg.style_split:]
        dec_style = ref_s[:, : cfg.style_split]
        en = self.expand(d, pred_dur, num_frames)
        f0, n_energy = self.predictor.f0n_train(en, style)
        t_en = self.text_encoder(input_ids)
        asr = self.expand(t_en, pred_dur, num_frames)
        return self.decoder(asr, f0, n_energy, dec_style)

    @torch.no_grad()
    def forward(self, input_ids, ref_s, speed=1.0, num_frames=None):
        duration, d = self.encode_durations(input_ids, ref_s, speed)
        pred_dur = torch.clamp(torch.round(duration), min=1).long()
        if num_frames is None:
            num_frames = int(pred_dur.sum(-1).max())
        pred_dur = self.fit_durations(pred_dur, num_frames)
        audio = self.decode_frames(
            input_ids, d, pred_dur, ref_s, num_frames
        )
        return audio, pred_dur, duration
