from gcpnet_tpu.data.features import normalize, orientations, rbf

__all__ = ["normalize", "orientations", "rbf"]
