from eincm_tpu.data.windowing import adjust_event_window
from eincm_tpu.data.synthetic import SyntheticDataLoader
from eincm_tpu.data.ecd import ECDDataLoader
from eincm_tpu.data.mvsec import MVSECDataLoader
from eincm_tpu.data.dsec import DSECDataLoader
from eincm_tpu.data.staging import stage_datasample, StagedSample
