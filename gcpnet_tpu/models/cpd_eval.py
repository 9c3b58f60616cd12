"""CPD test-time evaluation: per-datum perplexity and autoregressive
sequence recovery.

Re-design of the reference's CPD test protocol
(/root/reference/src/models/gcpnet_cpd_module.py:256-523): for each test
chain, (a) per-datum perplexity = exp(node-summed NLL / nodes), and (b)
sequence recovery = mean per-residue identity over ``num_samples``
autoregressively sampled sequences at temperature 0.1; the dataset-level
number is the MEDIAN over chains, reported for the ``all``, ``short`` and
``single_chain`` subsets (datamodule ``custom_splits``).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)


def datum_perplexity(model, params, graph: GraphData, bucket: Bucket) -> float:
    """exp(mean NLL over valid residues) for one chain."""
    batch = next(batches_from_dataset([graph], bucket, drop_last=False))
    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    _, log_probs = model.apply({"params": params}, dev, True)
    seq = np.asarray(batch.extras["seq"]).astype(int)
    mask = np.asarray(batch.valid_node_mask())
    lp = np.asarray(log_probs)
    nll = -lp[np.arange(lp.shape[0]), seq]
    nll = nll[mask]
    return float(np.exp(nll.mean())) if nll.size else float("nan")


def datum_recovery(
    model,
    params,
    graph: GraphData,
    num_samples: int = 100,
    temperature: float = 0.1,
    seed: int = 0,
) -> float:
    """Mean per-residue identity over sampled sequences
    (reference calculate_recovery_for_datum, :392-416)."""
    n = graph.num_nodes
    bucket = Bucket(
        num_nodes=n * num_samples,
        num_edges=graph.num_edges * num_samples,
        num_graphs=num_samples,
    )
    batch = next(
        batches_from_dataset([graph] * num_samples, bucket, drop_last=False)
    )
    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    sampled = model.apply(
        {"params": params},
        dev,
        jax.random.key(seed),
        n,
        method=type(model).sample,
    )
    sampled = np.asarray(sampled).reshape(num_samples, n)
    true_seq = np.asarray(graph.extras["seq"]).astype(int)
    valid = (
        np.asarray(graph.node_mask)
        if graph.node_mask is not None
        else np.ones(n, bool)
    )
    if not valid.any():
        return float("nan")
    return float((sampled[:, valid] == true_seq[valid][None, :]).mean())


def evaluate_cpd(
    model,
    params,
    graphs: Iterable[Tuple[str, GraphData]],
    custom_splits: Optional[Dict[str, set]] = None,
    num_samples: int = 100,
    temperature: float = 0.1,
    max_nodes: int = 2048,
    compute_recovery: bool = True,
) -> Dict[str, float]:
    """Returns median perplexity and recovery for 'all' plus each custom
    subset (reference test_epoch_end / compute_test_examples_metrics)."""
    custom_splits = custom_splits or {}
    per_chain: List[Tuple[str, float, Optional[float]]] = []
    bucket = Bucket(num_nodes=max_nodes, num_edges=max_nodes * 32, num_graphs=2)
    for name, graph in graphs:
        try:
            ppl = datum_perplexity(model, params, graph, bucket)
            rec = (
                datum_recovery(
                    model, params, graph, num_samples, temperature
                )
                if compute_recovery
                else None
            )
            per_chain.append((name, ppl, rec))
        except Exception as exc:
            log.warning(f"CPD eval failed for {name}: {exc}")

    def agg(names: Optional[set], key: str) -> Dict[str, float]:
        rows = [
            r for r in per_chain if names is None or r[0] in names
        ]
        out = {}
        ppls = [r[1] for r in rows if np.isfinite(r[1])]
        recs = [r[2] for r in rows if r[2] is not None and np.isfinite(r[2])]
        if ppls:
            out[f"test/{key}_perplexity"] = float(np.median(ppls))
        if recs:
            out[f"test/{key}_recovery"] = float(np.median(recs))
        return out

    metrics = agg(None, "all")
    for key, names in custom_splits.items():
        metrics.update(agg(set(names), key))
    return metrics
