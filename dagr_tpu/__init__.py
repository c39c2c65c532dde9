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
