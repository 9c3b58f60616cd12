from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg

__all__ = ["LayerCfg", "ModelCfg", "ModuleCfg", "MPCfg"]
