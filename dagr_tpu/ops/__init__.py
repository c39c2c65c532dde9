from dagr_tpu.ops.spline import bilinear_basis, spline_conv
from dagr_tpu.ops.pool import pool_graph
