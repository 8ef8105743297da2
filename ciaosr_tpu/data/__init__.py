"""Data layer: datasets, pipeline ops, degradation zoo, prefetch loader.

Importing this package registers ALL pipeline ops (including the
degradation zoo) so config-driven `Compose`/`build_dataset` consumers
never see a partially-populated registry.
"""

from ciaosr_tpu.data import pipelines as _pipelines  # noqa: F401 (registry)
from ciaosr_tpu.data import degradations as _degradations  # noqa: F401
