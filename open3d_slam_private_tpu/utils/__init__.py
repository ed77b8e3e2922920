from open3d_slam_private_tpu.utils import timing

__all__ = ["timing"]
