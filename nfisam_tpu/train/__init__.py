from .trainer import TrainConfig, fit_flow, fit_flow_raw, fit_flows_batched
