"""YAML / JSON configuration IO (reference: manipulation_main/common/io_utils.py)."""

import json
import os

import yaml


def load_yaml(file_path):
    with open(os.path.expanduser(file_path), "r") as f:
        return yaml.safe_load(f)


def save_yaml(data, file_path):
    with open(os.path.expanduser(file_path), "w") as f:
        yaml.safe_dump(data, f, default_flow_style=False)


def load_json(file_path):
    with open(os.path.expanduser(file_path), "r") as f:
        return json.load(f)


def save_json(data, file_path):
    with open(os.path.expanduser(file_path), "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)
