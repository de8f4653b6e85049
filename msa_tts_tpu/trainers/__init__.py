from .base import TrainerBase
from .baseline import JointTrainer
from .continual_er import ExperienceReplayTrainer
from .continual_er_reg import ExperienceReplayRegTrainer
from .continual_erkd import ExperienceReplayKnowledgeDistillTrainer
from .continual_ewc import EWCTrainer
from .cumulative import CumulativeTrainer
from .maml import MAML
from .metatrainer import MetaTrainer
from .reptile import Reptile
from .train_state import TrainState, make_optimizer

__all__ = [
    "TrainerBase",
    "JointTrainer",
    "MetaTrainer",
    "MAML",
    "Reptile",
    "ExperienceReplayTrainer",
    "ExperienceReplayKnowledgeDistillTrainer",
    "ExperienceReplayRegTrainer",
    "EWCTrainer",
    "CumulativeTrainer",
    "TrainState",
    "make_optimizer",
]
