from gcpnet_tpu.nn.primitives import (
    ScalarVector,
    safe_norm,
    norm_no_nan,
    get_nonlinearity,
    GCPLayerNorm,
    GCPDropout,
    pack_vector,
    safe_vec_norm,
    unpack_vector,
    vec_at,
    vec_components,
)
from gcpnet_tpu.nn.frames import (
    centralize,
    decentralize,
    localize,
    scalarize,
    vectorize,
)
from gcpnet_tpu.nn.gcp import GCP, GCP2, GCP3, make_gcp
from gcpnet_tpu.nn.embedding import GCPEmbedding
from gcpnet_tpu.nn.message_passing import GCPMessagePassing
from gcpnet_tpu.nn.interactions import GCPInteractions, GCPInteractions2
from gcpnet_tpu.nn.decoder import GCPMLPDecoder

__all__ = [
    "ScalarVector",
    "pack_vector",
    "unpack_vector",
    "vec_at",
    "vec_components",
    "safe_vec_norm",
    "safe_norm",
    "norm_no_nan",
    "get_nonlinearity",
    "GCPLayerNorm",
    "GCPDropout",
    "centralize",
    "decentralize",
    "localize",
    "scalarize",
    "vectorize",
    "GCP",
    "GCP2",
    "GCP3",
    "make_gcp",
    "GCPEmbedding",
    "GCPMessagePassing",
    "GCPInteractions",
    "GCPInteractions2",
    "GCPMLPDecoder",
]
