"""Op dispatch: every hot op has an XLA reference form and (where it pays)
a fused Pallas twin. ``use_pallas('auto')`` selects the Pallas path on real
accelerators and the XLA path on the CPU test mesh (where Pallas would run
interpreted and slow)."""

import jax


def use_pallas(mode: str = "auto") -> bool:
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() not in ("cpu",)


def select_infonce(mode: str = "auto"):
    if use_pallas(mode):
        from recsys_tpu.ops.pallas_contrastive import fused_bidirectional_infonce
        return fused_bidirectional_infonce
    from recsys_tpu.ops.contrastive import bidirectional_infonce
    return bidirectional_infonce


def select_logq_loss(mode: str = "auto"):
    if use_pallas(mode):
        from recsys_tpu.ops.pallas_contrastive import fused_inbatch_logq_loss
        return fused_inbatch_logq_loss
    from recsys_tpu.ops.contrastive import inbatch_logq_loss
    return inbatch_logq_loss
