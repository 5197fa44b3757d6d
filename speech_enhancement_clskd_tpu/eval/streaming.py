"""Streaming (chunked) DCCRN inference engine — the production serving path.

Processes audio in fixed-size chunks with a single jitted fixed-shape step
(no recompilation — ideal for TPU serving).  DCCRN is causal with a bounded
temporal receptive field in its conv stack (12 one-frame causal layers) but
unbounded memory in the LSTM, so the engine runs the model over a sliding
window of ``context + chunk`` frames and emits the last ``chunk`` frames:

- the conv stack is EXACT for ``context >= 12`` frames;
- the LSTM gets ``context`` frames of warmup per chunk, which bounds its
  state mismatch vs offline inference (empirically < 1 % amplitude for
  context >= 64 frames on speech — see tests/test_streaming.py);
- algorithmic latency = one chunk (``chunk_frames * hop`` samples).

BatchNorm runs in inference mode (running stats), so chunking does not
perturb normalization.  The reference has no serving path at all — its eval
loop feeds full utterances with cuDNN disabled (eval.py:13); this engine is
net-new capability.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import DCCRNConfig
from ..models.dccrn import make_model


class StreamingEnhancer:
    def __init__(
        self,
        cfg: DCCRNConfig,
        variables: dict,
        chunk_frames: int = 48,
        context_frames: int = 64,
        lookahead_frames: int = None,
    ):
        self.cfg = cfg
        self.model = make_model(cfg)
        self.variables = variables
        self.hop = cfg.stft.hop
        self.win = cfg.stft.win_len
        self.chunk = chunk_frames
        self.context = context_frames
        self.chunk_samples = chunk_frames * self.hop
        # right guard: the final samples of a window depend on future frames
        # (iSTFT overlap-adds up to win/hop - 1 future frames; the dccrnet
        # family's convs additionally look 1 frame ahead per encoder layer
        # and mirror that in the decoder), so emit samples that sit `guard`
        # before the window's right edge.  Costs `guard` samples of
        # algorithmic lookahead.
        if lookahead_frames is None:
            lookahead_frames = self.win // self.hop - 1
            if getattr(cfg, "family", "dccrn") == "dccrnet":
                lookahead_frames += 2 * len(cfg.kernel_num) + 1
        self.guard = lookahead_frames * self.hop
        self.window_samples = (
            (context_frames + chunk_frames) * self.hop + self.guard
        )

        @jax.jit
        def _step(variables, window):
            out = self.model.apply(variables, window, training=False)
            return out.wav[:, -(self.chunk_samples + self.guard) : -self.guard]

        self._step = _step

    def stream(self, wav: np.ndarray) -> np.ndarray:
        """Enhance [T] or [B, T] audio chunk-by-chunk; returns same shape."""
        squeeze = wav.ndim == 1
        x = np.atleast_2d(np.asarray(wav, np.float32))
        B, T = x.shape
        pad_t = (-T) % self.chunk_samples
        # left prime = context, right flush = tail pad + lookahead guard
        xp = np.pad(
            x,
            ((0, 0), (self.context * self.hop, pad_t + self.guard)),
        )
        out = np.zeros((B, T + pad_t), np.float32)
        n_chunks = (T + pad_t) // self.chunk_samples
        for i in range(n_chunks):
            start = i * self.chunk_samples
            window = jnp.asarray(xp[:, start : start + self.window_samples])
            y = np.asarray(self._step(self.variables, window))
            out[:, start : start + self.chunk_samples] = y
        out = out[:, :T]
        return out[0] if squeeze else out

    @property
    def latency_samples(self) -> int:
        return self.chunk_samples + self.guard

    @property
    def latency_ms(self) -> float:
        return 1000.0 * self.latency_samples / self.cfg.stft.sample_rate
