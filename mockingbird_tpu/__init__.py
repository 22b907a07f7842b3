"""mockingbird_tpu — a TPU-native voice-cloning framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
babysor/MockingBird (SV2TTS voice cloning: GE2E speaker encoder → Tacotron/VITS
synthesizer → WaveRNN/HiFi-GAN/Fre-GAN vocoder, plus PPG one-shot voice
conversion), designed TPU-first: SPMD over `jax.sharding.Mesh`, functional
models, static shapes, Pallas kernels for the hot ops.

Layout:
  dsp/       host (numpy) + device (JAX) signal processing
  text/      Mandarin/English text frontend
  models/    encoder (GE2E), tacotron, vits, vocoder (wavernn/hifigan/fregan), ppg
  ops/       Pallas TPU kernels (monotonic align, AR sampling, ...)
  parallel/  mesh construction + sharding rules
  train/     unified trainer harness, checkpointing, schedules
  cli/       command-line entry points
  serve/     HTTP serving layer
"""

__version__ = "0.1.0"
