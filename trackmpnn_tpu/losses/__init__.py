from trackmpnn_tpu.losses.losses import (
    bce_loss,
    ce_loss,
    focal_loss,
    make_targets,
    step_losses,
    f1_counts,
)

__all__ = ["bce_loss", "ce_loss", "focal_loss", "make_targets", "step_losses", "f1_counts"]
