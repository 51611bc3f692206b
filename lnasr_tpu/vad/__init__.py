"""Voice activity detection.

Three detector families, mirroring the reference's VAD sidecars
(``third/pyvad``, ``third/pywvad``, ``third/vadlstd``) with a TPU-era
split:

- :mod:`lnasr_tpu.vad.ltsd` — Long-Term Spectral Divergence VAD as a
  batched JAX program (offline / on-device).
- :mod:`lnasr_tpu.vad.webrtc` — WebRTC-style 6-band GMM VAD as a JAX
  program (filter cascade vectorized over the signal, GMM adaptation as a
  ``lax.scan`` over frames) for offline batch segmentation.
- :mod:`lnasr_tpu.vad.native` — streaming C++ detectors (WebRTC-style GMM
  and AMR-WB filterbank VADs) bound via ctypes for the realtime host path.
"""

from lnasr_tpu.vad.ltsd import VadLtsd
from lnasr_tpu.vad.native import AmrWbVad, WebRtcVad

__all__ = ["VadLtsd", "AmrWbVad", "WebRtcVad"]
