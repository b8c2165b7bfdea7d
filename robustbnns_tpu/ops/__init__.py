from robustbnns_tpu.ops.sampled_dense import sampled_dense, sampled_dense_reference

__all__ = ["sampled_dense", "sampled_dense_reference"]
