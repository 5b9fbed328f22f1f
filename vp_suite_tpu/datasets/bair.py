r"""BAIR robot pushing dataset.

Capability parity with ``vp_suite/datasets/bair.py:13-143``: paired
``seq_XXXXX_obs.npy`` / ``seq_XXXXX_actions.npy`` files (prepared from the
tfrecords at download time), 64x64 RGB + 4-D actions. The tfrecord extraction
uses ``tensorflow``'s record reader (available here) instead of the reference's
``tfrecord`` pip package.
"""
import os
from pathlib import Path

import numpy as np

from vp_suite_tpu.base.base_dataset import VPDataset, VPData
from vp_suite_tpu.defaults import SETTINGS


class BAIRPushingDataset(VPDataset):
    NAME = "BAIR robot pushing"
    REFERENCE = "https://arxiv.org/abs/1710.05268"
    IS_DOWNLOADABLE = "Yes"
    DEFAULT_DATA_DIR = SETTINGS.DATA_PATH / "bair_robot_pushing"
    MIN_SEQ_LEN = 30
    ACTION_SIZE = 4
    DATASET_FRAME_SHAPE = (64, 64, 3)

    train_to_val_ratio = 0.96

    def __init__(self, split, **dataset_kwargs):
        super().__init__(split, **dataset_kwargs)
        self.NON_CONFIG_VARS.extend(["obs_ids", "actions_ids", "obs_fps", "actions_fps"])

        self.data_dir = str((Path(self.data_dir) / "softmotion30_44k" / split).resolve())
        if not os.path.isdir(self.data_dir):
            raise FileNotFoundError(f"no dataset split dir at {self.data_dir}")
        self.obs_ids = [fn for fn in sorted(os.listdir(self.data_dir)) if fn.endswith("obs.npy")]
        self.actions_ids = [fn for fn in sorted(os.listdir(self.data_dir))
                            if fn.endswith("actions.npy")]
        if len(self.obs_ids) != len(self.actions_ids):
            raise ValueError("Different number of obs and action files found "
                             "-> Delete dataset and prepare again!")
        elif len(self.obs_ids) == 0:
            raise ValueError("No trajectory files (.npy) found! "
                             "Maybe you forgot to prepare the dataset?")
        self.obs_fps = [os.path.join(self.data_dir, i) for i in self.obs_ids]
        self.actions_fps = [os.path.join(self.data_dir, i) for i in self.actions_ids]

    def __len__(self):
        return len(self.obs_fps)

    def __getitem__(self, i) -> VPData:
        if not self.ready_for_usage:
            raise RuntimeError("Dataset is not yet ready for usage "
                               "(maybe you forgot to call set_seq_len()).")
        obs_fp = self.obs_fps[i]
        rgb_raw = np.load(obs_fp)  # [T, h, w, c] uint8
        rgb_raw = rgb_raw[:self.seq_len:self.seq_step]
        frames = self.preprocess(rgb_raw)
        actions = np.load(self.actions_fps[i]).astype(np.float32)
        actions = actions[:self.seq_len:self.seq_step]
        return {"frames": frames, "actions": actions, "origin": obs_fp}

    @classmethod
    def download_and_prepare_dataset(cls):
        d_path = cls.DEFAULT_DATA_DIR
        d_path.mkdir(parents=True, exist_ok=True)
        ds_path = d_path / "softmotion30_44k"
        if not ds_path.exists():
            tar_fname = "bair_robot_pushing_dataset_v0.tar"
            tar_path = d_path / tar_fname
            if not tar_path.exists():
                from vp_suite_tpu.utils.utils import download_from_url
                download_from_url(f"http://rail.eecs.berkeley.edu/datasets/{tar_fname}", tar_path)
            print("Extracting data...")
            import tarfile
            with tarfile.open(tar_path) as tar:
                tar.extractall(d_path)
            os.remove(tar_path)
        print("splitting trajectory files...")
        split_bair_traj_files(ds_path / "train", True)
        split_bair_traj_files(ds_path / "test", True)


def split_bair_traj_files(data_dir: Path, delete_tfrecords: bool):
    r"""Extracts per-episode obs/action numpy pairs from BAIR tfrecords
    (parity flow: ``bair.py:101-142``), reading records with tensorflow."""
    import tensorflow as tf
    bair_ep_length = 30
    data_files = [fn for fn in sorted(os.listdir(data_dir)) if fn.endswith(".tfrecords")]
    ep_number = 0
    for df in data_files:
        tfr_fp = str((data_dir / df).resolve())
        for raw_record in tf.data.TFRecordDataset(tfr_fp):
            example = tf.train.Example()
            example.ParseFromString(raw_record.numpy())
            feat = example.features.feature
            observations, actions = [], []
            for step_i in range(bair_ep_length):
                img_key = f"{step_i}/image_aux1/encoded"
                act_key = f"{step_i}/action"
                obs = np.frombuffer(feat[img_key].bytes_list.value[0],
                                    dtype=np.uint8).reshape(1, 64, 64, 3)
                action = np.array(feat[act_key].float_list.value,
                                  dtype=np.float32)[np.newaxis]
                observations.append(obs)
                actions.append(action)
            np.save(data_dir / f"seq_{ep_number:05d}_obs.npy",
                    np.concatenate(observations, axis=0))
            np.save(data_dir / f"seq_{ep_number:05d}_actions.npy",
                    np.concatenate(actions, axis=0))
            ep_number += 1
        if delete_tfrecords:
            os.remove(tfr_fp)
