"""Task model registry.

One model class per reference task pipeline (SURVEY.md §2.3); the registry
maps both our names and the reference's ``_target_`` strings so reference
YAML configs resolve unchanged.
"""

from gcpnet_tpu.models.ar import GCPNetAR, ar_loss
from gcpnet_tpu.models.cpd import GCPNetCPD, cpd_loss
from gcpnet_tpu.models.eq import GCPNetEQ, eq_loss
from gcpnet_tpu.models.lba import GCPNetLBA, GCPNetPSR, graph_regression_loss
from gcpnet_tpu.models.nms import GCPNetNMS, nms_loss
from gcpnet_tpu.models.rs import GCPNetRS, rs_loss

MODEL_REGISTRY = {
    "GCPNetLBA": GCPNetLBA,
    "GCPNetPSR": GCPNetPSR,
    "GCPNetCPD": GCPNetCPD,
    "GCPNetNMS": GCPNetNMS,
    "GCPNetRS": GCPNetRS,
    "GCPNetEQ": GCPNetEQ,
    "GCPNetAR": GCPNetAR,
    # reference _target_ aliases (configs/model/gcpnet_*.yaml)
    "src.models.gcpnet_lba_module.GCPNetLBALitModule": GCPNetLBA,
    "src.models.gcpnet_psr_module.GCPNetPSRLitModule": GCPNetPSR,
    "src.models.gcpnet_cpd_module.GCPNetCPDLitModule": GCPNetCPD,
    "src.models.gcpnet_nms_module.GCPNetNMSLitModule": GCPNetNMS,
    "src.models.gcpnet_rs_module.GCPNetRSLitModule": GCPNetRS,
    "src.models.gcpnet_eq_module.GCPNetEQLitModule": GCPNetEQ,
    "src.models.gcpnet_ar_module.GCPNetARLitModule": GCPNetAR,
}

LOSS_REGISTRY = {
    "GCPNetLBA": graph_regression_loss,
    "GCPNetPSR": graph_regression_loss,
    "GCPNetCPD": cpd_loss,
    "GCPNetNMS": nms_loss,
    "GCPNetRS": rs_loss,
    "GCPNetEQ": eq_loss,
    "GCPNetAR": ar_loss,
}

__all__ = [
    "GCPNetLBA",
    "GCPNetPSR",
    "GCPNetCPD",
    "GCPNetNMS",
    "GCPNetRS",
    "GCPNetEQ",
    "GCPNetAR",
    "MODEL_REGISTRY",
    "LOSS_REGISTRY",
    "graph_regression_loss",
    "cpd_loss",
    "nms_loss",
    "rs_loss",
    "eq_loss",
    "ar_loss",
]
