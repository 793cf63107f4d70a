from .metrics import LPIPSMeter, PSNRMeter, SSIMMeter
from .trainer import Trainer

__all__ = ["PSNRMeter", "SSIMMeter", "LPIPSMeter", "Trainer"]
