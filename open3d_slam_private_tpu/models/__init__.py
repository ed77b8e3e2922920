from open3d_slam_private_tpu.models import icp, localizability, minimizers

__all__ = ["icp", "localizability", "minimizers"]
