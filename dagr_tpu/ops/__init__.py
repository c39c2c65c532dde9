from dagr_tpu.ops.spline import (
    bilinear_basis, edge_basis, level_basis, nodeset_conv, spline_conv,
    stencil_basis, stencil_spline_conv,
)
from dagr_tpu.ops.pool import pool_graph, pool_nodeset
from dagr_tpu.ops.nms import iou_xyxy, nms_mask, postprocess

__all__ = [
    "bilinear_basis", "edge_basis", "level_basis", "nodeset_conv",
    "spline_conv", "stencil_basis", "stencil_spline_conv",
    "pool_graph", "pool_nodeset",
    "iou_xyxy", "nms_mask", "postprocess",
]
