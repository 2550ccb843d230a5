"""openvis-tpu: TPU-native open-vocabulary video instance segmentation.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
clownrat6/OpenVIS (OpenVIS / BriVIS / SAN / MasQCLIP / OV2Seg family).
"""

__version__ = "0.1.0"

from openvis_tpu.config import Config, load_config  # noqa: F401
