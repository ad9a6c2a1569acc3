#!/bin/bash
# MMLU 5-shot: one independent finetune per domain (role parity: reference
# example_scripts/mmlu/mmlu-5-shot.sh, which fans the 57 domains over a SLURM
# array; here pass the domain as $1, or iterate:
#   for d in $(cat example_scripts/mmlu/domains.txt); do bash 5-shot.sh $d; done).
# Recipe details (permutation de-biasing, prebuilt index) in README_MMLU

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-xl}
DOMAIN=${1:?pass an MMLU domain, e.g. abstract_algebra}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-mmlu-5shot-${DOMAIN}-${SIZE}}

TRAIN_FILE="${DATA_DIR}/data/mmlu_data/5-shot/individual_train/${DOMAIN}.5-shot-train.jsonl"
EVAL_FILES="${DATA_DIR}/data/mmlu_data/5-shot/individual_valid/${DOMAIN}.val.jsonl ${DATA_DIR}/data/mmlu_data/5-shot/individual_valid/${DOMAIN}.test.jsonl"
PRETRAINED_MODEL=${DATA_DIR}/models/atlas/${SIZE}_tpu
PRETRAINED_INDEX=${DATA_DIR}/indices/atlas/wiki/${SIZE}

python train.py \
    --shuffle \
    --train_retriever --gold_score_mode ppmean \
    --use_gradient_checkpoint_reader \
    --use_gradient_checkpoint_retriever \
    --precision bf16 \
    --shard_optim --shard_grads \
    --temperature_gold 0.1 --temperature_score 0.1 \
    --refresh_index -1 \
    --target_maxlength 16 \
    --reader_model_type google/t5-${SIZE}-lm-adapt \
    --dropout 0.1 --weight_decay 0.01 \
    --lr 5e-5 --lr_retriever 1e-5 --scheduler linear \
    --text_maxlength 512 \
    --model_path "${PRETRAINED_MODEL}" \
    --train_data ${TRAIN_FILE} \
    --eval_data ${EVAL_FILES} \
    --per_gpu_batch_size 1 \
    --n_context 30 --retriever_n_context 30 \
    --name ${EXPERIMENT_NAME} \
    --checkpoint_dir ./checkpoint \
    --eval_freq 4 --log_freq 4 \
    --total_steps 16 --warmup_steps 4 --save_freq 10000000000 \
    --write_results \
    --task multiple_choice \
    --multiple_choice_train_permutations all \
    --multiple_choice_eval_permutations cyclic \
    --index_mode flat \
    --query_side_retriever_training \
    --load_index_path "${PRETRAINED_INDEX}"
