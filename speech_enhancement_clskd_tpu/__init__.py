"""speech_enhancement_clskd_tpu — a TPU-native speech-enhancement + cross-layer
knowledge-distillation framework (JAX / XLA / Pallas / pjit).

Re-designed from scratch with the capability surface of
KhanhNguyen4999/Speech-Enhancement-CLSKD (see SURVEY.md), built TPU-first:

- framed STFT/iSTFT as MXU matmuls (`ops.stft`)
- complex-valued conv / transpose-conv / LSTM / batchnorm as single fused real
  ops on packed (re, im) channel blocks (`ops.complex_layers`, `ops.complex_lstm`)
- a parameterized DCCRN model family covering teacher and student geometry with
  *explicit* feature taps (no forward hooks) (`models.dccrn`)
- a pure-function loss library: SDR/SI-SNR/SI-SDR, multi-scale log-mel,
  MRSTFT, SPKD Gram loss, HCL, PMSQE (`losses`)
- trainable ABF/ReviewKD cross-layer fusion (`distill`)
- pjit/`shard_map` data+model parallelism over a device mesh (`parallel`)
- batched on-device STOI and eval metrics (`metrics`)
- orbax training checkpoints + publishable inference bundles (`utils.serialization`)
"""

__version__ = "0.1.0"
