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

# Persistent XLA compilation cache: TPU compiles of the bigger programs run
# 10-60 s; caching them across processes makes CLI tools start fast. Disable
# with MB_COMPILATION_CACHE=0.
import os as _os

if (_os.environ.get("MB_COMPILATION_CACHE", "1") != "0"
        and _os.environ.get("JAX_PLATFORMS", "") not in ("cpu",)):
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ.get("MB_CACHE_DIR",
                                           _os.path.expanduser("~/.cache/mockingbird_tpu/xla")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
