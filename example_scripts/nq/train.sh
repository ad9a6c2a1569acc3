#!/bin/bash
# 64-shot NQ finetuning of Atlas-large on a TPU slice
# (role parity: reference example_scripts/nq/train.sh — same task recipe, TPU launch).
# Expected quality anchor: dev EM ~38 (reference README.md:176).
#
# On a multi-host TPU slice, launch this same command on every host; jax discovers
# the topology (no torchrun/SLURM plumbing needed beyond the scheduler's env).

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-large}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-nq-64shot-${SIZE}}

port=$(shuf -i 15000-16000 -n 1)
TRAIN_FILE="${DATA_DIR}/data/nq_data/train.64-shot.jsonl"
EVAL_FILES="${DATA_DIR}/data/nq_data/dev.jsonl"
PRETRAINED_MODEL=${DATA_DIR}/models/atlas/${SIZE}_tpu   # converted via tools/convert_torch_artifacts.py
PASSAGES="${DATA_DIR}/corpora/wiki/enwiki-dec2018/text-list-100-sec.jsonl ${DATA_DIR}/corpora/wiki/enwiki-dec2018/infobox.jsonl"

python train.py \
    --shuffle \
    --train_retriever --query_side_retriever_training \
    --gold_score_mode ppmean \
    --use_gradient_checkpoint_reader \
    --precision bf16 \
    --temperature_gold 0.01 --temperature_score 0.01 \
    --refresh_index -1 \
    --target_maxlength 16 \
    --reader_model_type google/t5-${SIZE}-lm-adapt \
    --dropout 0.1 --weight_decay 0.01 \
    --lr 4e-5 --lr_retriever 4e-5 --scheduler linear \
    --text_maxlength 512 \
    --model_path "${PRETRAINED_MODEL}" \
    --train_data ${TRAIN_FILE} \
    --eval_data ${EVAL_FILES} \
    --per_gpu_batch_size 1 \
    --n_context 40 --retriever_n_context 40 \
    --name ${EXPERIMENT_NAME} \
    --checkpoint_dir ./checkpoint \
    --eval_freq 30 --log_freq 4 \
    --total_steps 30 --warmup_steps 5 --save_freq 30 \
    --main_port $port \
    --write_results \
    --task qa \
    --passages ${PASSAGES} \
    --save_index_path ./checkpoint/${EXPERIMENT_NAME}/saved_index \
    --save_index_n_shards 128
