#!/bin/bash
# TempLAMA closed-vs-updated-index study: finetune Atlas on a yearly TempLAMA
# split against the matching wiki snapshot (role parity: reference
# example_scripts/templama/train.sh). Pass the year as $1 (2017 or 2020).

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-xl}
YEAR=${1:-2017}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-templama-${YEAR}-${SIZE}}

TRAIN_FILE="${DATA_DIR}/data/templama_data/temp_lama.train.${YEAR}.jsonl"
EVAL_FILES="${DATA_DIR}/data/templama_data/temp_lama.valid.${YEAR}.jsonl ${DATA_DIR}/data/templama_data/temp_lama.test.${YEAR}.jsonl"
PRETRAINED_MODEL=${DATA_DIR}/models/atlas/${SIZE}_tpu
PASSAGES="${DATA_DIR}/corpora/wiki/enwiki-dec${YEAR}/text-list-100-sec.jsonl ${DATA_DIR}/corpora/wiki/enwiki-dec${YEAR}/infobox.jsonl"

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
    --per_gpu_batch_size 1 \
    --n_context 20 --retriever_n_context 20 \
    --name ${EXPERIMENT_NAME} \
    --checkpoint_dir ./checkpoint \
    --eval_freq 20 --log_freq 4 \
    --total_steps 100 --warmup_steps 20 --save_freq 100 \
    --write_results \
    --task qa \
    --index_mode flat \
    --passages ${PASSAGES} \
    --qa_prompt_format "{question}"
