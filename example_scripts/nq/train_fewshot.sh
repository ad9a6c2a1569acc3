#!/bin/bash
# 64-shot NQ finetuning from a PREBUILT index (role parity: reference
# example_scripts/nq/train_fewshot.sh). Unlike nq/train.sh, this loads the
# released wiki index instead of embedding passages, and shards optimizer state
# and grads over the dp axis (ZeRO role) to fit larger readers.

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-large}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-nq-64shot-prebuilt-${SIZE}}

TRAIN_FILE="${DATA_DIR}/data/nq_data/train.64-shot.jsonl"
EVAL_FILES="${DATA_DIR}/data/nq_data/dev.jsonl ${DATA_DIR}/data/nq_data/test.jsonl"
PRETRAINED_MODEL=${DATA_DIR}/models/atlas/${SIZE}_tpu
PRETRAINED_INDEX=${DATA_DIR}/indices/atlas/wiki/${SIZE}

python train.py \
    --shuffle \
    --train_retriever --query_side_retriever_training \
    --gold_score_mode ppmean \
    --use_gradient_checkpoint_reader \
    --use_gradient_checkpoint_retriever \
    --precision bf16 \
    --shard_optim --shard_grads \
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
    --per_gpu_batch_size 2 \
    --n_context 40 --retriever_n_context 40 \
    --name ${EXPERIMENT_NAME} \
    --checkpoint_dir ./checkpoint \
    --eval_freq 30 --log_freq 4 \
    --total_steps 30 --warmup_steps 5 --save_freq 30 \
    --write_results \
    --task qa \
    --index_mode flat \
    --load_index_path "${PRETRAINED_INDEX}"
