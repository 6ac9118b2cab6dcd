from ark_tpu.ops.losses import masked_cross_entropy, token_nll, kl_mean_weighted

__all__ = ["masked_cross_entropy", "token_nll", "kl_mean_weighted"]
