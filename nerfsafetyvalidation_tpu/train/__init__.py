from .trainer import Trainer
from .metrics import PSNRMeter, LPIPSMeter, ssim

__all__ = ["Trainer", "PSNRMeter", "LPIPSMeter", "ssim"]
