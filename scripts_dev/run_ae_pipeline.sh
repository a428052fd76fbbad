#!/bin/bash
# Full AE pipeline on TPU: collect -> train -> test -> visualize
set -e
cd /root/repo
python -m deep_rl_grasping_tpu.training.collect_dataset \
    --config configs/simplified_object_picking.yaml \
    --out encoder_files/dataset.npz --train 18000 --test 2000 --num_envs 128
python -m deep_rl_grasping_tpu.training.train_encoder train \
    --data encoder_files/dataset.npz --model_dir encoder_files/default
python -m deep_rl_grasping_tpu.training.train_encoder test \
    --data encoder_files/dataset.npz --model_dir encoder_files/default
python -m deep_rl_grasping_tpu.training.train_encoder visualize \
    --data encoder_files/dataset.npz --model_dir encoder_files/default
