from gpar_at_scale_tpu.data.toy import (
    ToyDataset,
    generate_big_dataset,
    generate_small_dataset,
)
from gpar_at_scale_tpu.data.eeg import EEGDataset, generate_synthetic_eeg, load_eeg
