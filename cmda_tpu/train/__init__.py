from .optim import make_optimizer, poly_warmup_schedule

__all__ = ["make_optimizer", "poly_warmup_schedule"]
