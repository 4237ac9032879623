from .trainer import TrainConfig, fit_flow
