from gcpnet_tpu.utils.amber.relax import AmberRelaxation
from gcpnet_tpu.utils.amber.violations import structural_violations

__all__ = ["AmberRelaxation", "structural_violations"]
