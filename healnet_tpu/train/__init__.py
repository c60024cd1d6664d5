from healnet_tpu.train.losses import (
    CoxPHSurvLoss,
    CrossEntropySurvLoss,
    ce_loss,
    cox_ph_loss,
    hazards_survival_risk,
    nll_loss,
    nll_loss_from_logits,
)
from healnet_tpu.train.metrics import concordance_index_censored
from healnet_tpu.train.schedule import make_optimizer, onecycle_beta1, onecycle_lr
from healnet_tpu.train.loop import SurvivalTrainer, iterate_batches
from healnet_tpu.train.checkpoint import Checkpointer
from healnet_tpu.train.multimodn_trainer import MultiModNTrainer

__all__ = [
    "CoxPHSurvLoss",
    "CrossEntropySurvLoss",
    "ce_loss",
    "cox_ph_loss",
    "hazards_survival_risk",
    "nll_loss",
    "nll_loss_from_logits",
    "concordance_index_censored",
    "make_optimizer",
    "onecycle_beta1",
    "onecycle_lr",
    "SurvivalTrainer",
    "iterate_batches",
    "Checkpointer",
    "MultiModNTrainer",
]
