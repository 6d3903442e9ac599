"""lycoris_tpu.models — flax model components and test fixtures.

- :mod:`.layers`: torch-layout linen primitives (the perf path).
- :mod:`.unet`: SD1.5/SDXL-style UNet blocks for the fine-tune benches.
- :mod:`.dit`: a minimal Flux-style DiT used as the wrapper-test fixture.
"""

from . import layers
