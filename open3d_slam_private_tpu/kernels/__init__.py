from open3d_slam_private_tpu.kernels import knn_pallas

__all__ = ["knn_pallas"]
