from ciaosr_tpu.models.mlp import ImplicitMLP  # noqa: F401
from ciaosr_tpu.models.edsr import EDSREncoder  # noqa: F401
from ciaosr_tpu.models.rdn import RDNEncoder  # noqa: F401
from ciaosr_tpu.models.csa import CrossScaleAttention  # noqa: F401
from ciaosr_tpu.models.ciaosr import CiaoSRNet  # noqa: F401
from ciaosr_tpu.models.builder import build_generator, build_model  # noqa: F401
from ciaosr_tpu.models.swinir import SwinIREncoder  # noqa: F401
from ciaosr_tpu.models.restorers import CiaoSRRestorer  # noqa: F401
