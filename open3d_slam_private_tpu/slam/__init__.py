from open3d_slam_private_tpu.slam import (
    mapper,
    motion_compensation,
    odometry,
    pose_graph,
    submap,
    transform_buffer,
)

__all__ = [
    "mapper",
    "motion_compensation",
    "odometry",
    "pose_graph",
    "submap",
    "transform_buffer",
]
