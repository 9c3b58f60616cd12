"""Datamodule construction from composed config blocks.

Maps the reference datamodule config schemas (configs/datamodule/*.yaml)
onto the gcpnet_tpu datamodule constructors, tolerating torch-specific
knobs (num_workers, pin_memory) that have no meaning in a jax host
pipeline.
"""

from __future__ import annotations

from typing import Any, Dict


def build_datamodule(block: Dict[str, Any], num_shards: int = 1, seed: int = 42):
    target = str(block.get("_target_", "")).rsplit(".", 1)[-1]

    if target == "NMSDataModule":
        from gcpnet_tpu.data.nms import NMSDataModule

        return NMSDataModule(
            data_root=block.get("data_dir", "data/NMS"),
            data_mode=block.get("data_mode", "small"),
            batch_size=int(block.get("batch_size", 100)),
            frame_0=int(block.get("frame_O", block.get("frame_0", 30))),
            frame_T=int(block.get("frame_T", 40)),
            rbf_edge_dist_cutoff=float(block.get("rbf_edge_dist_cutoff", 4.5)),
            num_rbf=int(block.get("num_rbf", 16)),
            num_train=block.get("num_train"),
            num_valid=block.get("num_valid"),
            num_test=block.get("num_test"),
            num_shards=num_shards,
        )

    if target == "ATOM3DDataModule":
        from gcpnet_tpu.data.atom3d import ATOM3DDataModule

        return ATOM3DDataModule(
            task=block.get("task", "LBA"),
            data_dir=block.get("data_dir", "data/ATOM3D"),
            lba_split=int(block.get("lba_split", 30)),
            edge_cutoff=float(block.get("edge_cutoff", 4.5)),
            max_neighbors=int(block.get("max_neighbors", 32)),
            max_units=int(block.get("max_units", 0)),
            unit=block.get("unit", "edge"),
            batch_size=int(block.get("batch_size", 16)),
            num_shards=num_shards,
        )

    if target == "CATHDataModule":
        from gcpnet_tpu.data.cath import CATHDataModule

        return CATHDataModule(
            data_dir=block.get("data_dir", "data/CATH"),
            file_name=block.get("file_name", "chain_set.jsonl"),
            splits_file_name=block.get(
                "splits_file_name", "chain_set_splits.json"
            ),
            short_file_name=block.get("short_file_name", "test_split_L100.json"),
            single_chain_file_name=block.get(
                "single_chain_file_name", "test_split_sc.json"
            ),
            max_neighbors=int(block.get("max_neighbors", 32)),
            max_units=int(block.get("max_units", 0)),
            unit=block.get("unit", "edge"),
            batch_size=int(block.get("batch_size", 8)),
            features_cfg=block.get("features_cfg") or {},
            num_shards=num_shards,
        )

    if target == "RSDataModule":
        from gcpnet_tpu.data.rs import RSDataModule

        return RSDataModule(
            train_data_filepath=block.get("train_data_filepath"),
            val_data_filepath=block.get("val_data_filepath"),
            test_data_filepath=block.get("test_data_filepath"),
            seed=int(block.get("seed", seed) or seed),
            iteration_mode=block.get("iteration_mode", "stereoisomers"),
            sample_1_conformer=bool(block.get("sample_1_conformer", False)),
            mask_coordinates=bool(block.get("mask_coordinates", False)),
            stereo_mask=bool(block.get("stereo_mask", True)),
            num_pos=int(block.get("num_pos", 0)),
            num_neg=int(block.get("num_neg", 1)),
            d_max=float(block.get("D_max", 4.5)),
            num_rbf=int(block.get("num_rbf", 16)),
            batch_size=int(block.get("batch_size", 64)),
            num_shards=num_shards,
            synthetic_sizes=block.get("synthetic_sizes"),
        )

    if target == "EQDataModule":
        from gcpnet_tpu.data.eq import EQDataModule

        return EQDataModule(
            splits_dir=block.get("splits_dir"),
            decoy_dir=block.get("decoy_dir"),
            true_dir=block.get("true_dir"),
            model_data_cache_dir=block.get("model_data_cache_dir"),
            edge_cutoff=float(block.get("edge_cutoff", 4.5)),
            max_neighbors=int(block.get("max_neighbors", 32)),
            rbf_edge_dist_cutoff=float(block.get("rbf_edge_dist_cutoff", 4.5)),
            num_rbf=int(block.get("num_rbf", 16)),
            lddt_exec_path=block.get("lddt_exec_path"),
            subset_to_ca_atoms_only=bool(
                block.get("subset_to_ca_atoms_only", False)
            ),
            batch_size=int(block.get("batch_size", 1)),
            predict_input_dir=block.get("predict_input_dir"),
            predict_true_dir=block.get("predict_true_dir"),
            predict_output_dir=block.get("predict_output_dir"),
            num_shards=num_shards,
        )

    if target == "ARDataModule":
        from gcpnet_tpu.data.ar import ARDataModule

        return ARDataModule(
            splits_dir=block.get("splits_dir"),
            af2_dir=block.get("af2_dir"),
            true_dir=block.get("true_dir"),
            model_data_cache_dir=block.get("model_data_cache_dir"),
            split_index=int(block.get("split_index", 1)),
            rbf_edge_dist_cutoff=float(block.get("rbf_edge_dist_cutoff", 4.5)),
            num_rbf=int(block.get("num_rbf", 16)),
            k_min=int(block.get("k_min", 12)),
            k_max=int(block.get("k_max", 128)),
            max_tmscore_metric_threshold=float(
                block.get("max_tmscore_metric_threshold", 1.1)
            ),
            subset_to_backbone_atoms_only=bool(
                block.get("subset_to_backbone_atoms_only", False)
            ),
            batch_size=int(block.get("batch_size", 1)),
            predict_input_dir=block.get("predict_input_dir"),
            predict_true_dir=block.get("predict_true_dir"),
            predict_output_dir=block.get("predict_output_dir"),
            num_shards=num_shards,
        )

    raise ValueError(f"unknown datamodule target {target!r}")
