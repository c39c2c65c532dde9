"""dagr_tpu — a TPU-native event-camera object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of DAGR
("Low Latency Automotive Vision with Event Cameras", Nature 2024;
reference implementation: uzh-rpg/dagr).  The design is TPU-first:

* events live in fixed-capacity padded buffers with validity masks
  (no ragged tensors, no dynamic shapes under jit);
* the spatio-temporal event graph is a fixed-degree neighbor list
  ``int32[B, N, K]`` built by a sort-based, fully static algorithm
  (reference: CUDA spiral/queue kernels in src/dagr/graph/ev_graph.cu);
* after the first voxel-grid pooling the graph collapses onto a dense
  voxel grid (<= a few thousand cells), where message passing becomes a
  masked 9-offset dense stencil that maps straight onto the MXU;
* B-spline convolutions use an aggregate-then-matmul formulation so the
  hot loop is a plain ``[n, 25*Cin] @ [25*Cin, Cout]`` matmul;
* training scales with data parallelism over a ``jax.sharding.Mesh``;
  streaming inference is per-chip embarrassingly parallel.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import dagr_tpu` light)."""
    import importlib

    api = {
        "DagrConfig": "dagr_tpu.config",
        "config_from_yaml": "dagr_tpu.config",
        "parse_flags": "dagr_tpu.config",
        "EventBatch": "dagr_tpu.core.types",
        "EventGraph": "dagr_tpu.core.types",
        "NodeSet": "dagr_tpu.core.types",
        "build_graph": "dagr_tpu.graph.build",
        "DAGR": "dagr_tpu.models.dagr",
        "detect": "dagr_tpu.models.dagr",
        "detection_loss": "dagr_tpu.models.dagr",
        "StreamingDetector": "dagr_tpu.streaming.engine",
        "load_reference_checkpoint": "dagr_tpu.models.torch_import",
    }
    if name in api:
        return getattr(importlib.import_module(api[name]), name)
    raise AttributeError(f"module 'dagr_tpu' has no attribute {name!r}")
