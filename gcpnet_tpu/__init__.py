"""gcpnet_tpu: a TPU-native (JAX/XLA/Pallas) framework for geometry-complete
SE(3)-equivariant message passing over 3D molecular graphs.

Re-designed from scratch with the capabilities of BioinfoMachineLearning/GCPNet
(reference mounted at /root/reference), built TPU-first:

- static padded graph batches (``gcpnet_tpu.graph.GraphBatch``) instead of
  dynamically-shaped PyG ``Batch`` objects,
- masked segment reductions (``gcpnet_tpu.ops.segment``) instead of
  torch_scatter,
- pure-function geometry primitives (``gcpnet_tpu.nn.frames``),
- flax modules for the GCP family (``gcpnet_tpu.nn.gcp``),
- a jit-compiled optax trainer with data-parallel sharding over a device
  mesh (``gcpnet_tpu.train``, ``gcpnet_tpu.parallel``),
- a YAML config system preserving the reference's config schema
  (``gcpnet_tpu.config``).
"""

__version__ = "0.1.0"
