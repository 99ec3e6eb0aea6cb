from .indexer import (
    load_stay,
    build_onetime_train_index,
    build_multiple_train_index,
    build_eval_index,
)
from .dataset import TrainingDataset, EvalDataset
from .pipeline import BatchLoader, get_data_loaders, get_test_data_loader
