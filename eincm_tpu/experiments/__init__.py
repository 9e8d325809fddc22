from eincm_tpu.experiments.config import ExperimentConfig, load_config
from eincm_tpu.experiments.manager import EINCMExperiment
