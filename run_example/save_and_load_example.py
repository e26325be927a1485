"""Save/load example (parity: reference run_example/save_and_load_example.py):
persist the dataset and the split dataloaders, reload, and continue."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recbole_tpu.config.configurator import Config
from recbole_tpu.data.utils import (create_dataset, data_preparation,
                                    load_split_dataloaders)

if __name__ == "__main__":
    config = Config("BPR", "ml-100k", config_dict={"epochs": 1})
    ds = create_dataset(config)
    ds.save(config["checkpoint_dir"])                 # dataset pickle
    train, valid, test = data_preparation(config, ds, save=True)

    path = os.path.join(config["checkpoint_dir"],
                        "ml-100k-for-BPR-dataloader.pkl")
    train2, valid2, test2 = load_split_dataloaders(path)
    print("reloaded loaders:", len(train2.dataset), "train rows,",
          test2.n_eval_users, "test users")
