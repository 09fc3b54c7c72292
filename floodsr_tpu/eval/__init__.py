from floodsr_tpu.eval.metrics import compute_depth_error_metrics, depth_metrics_jax

__all__ = ["compute_depth_error_metrics", "depth_metrics_jax"]
