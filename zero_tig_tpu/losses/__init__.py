from .zero_tig_loss import smooth_loss, tv_loss, zero_tig_loss

__all__ = ["smooth_loss", "tv_loss", "zero_tig_loss"]
