#!/bin/bash
# MMLU full/transfer setting: finetune on the auxiliary-task train set (~95k
# examples) and evaluate on the combined 57-domain test set (role parity:
# reference example_scripts/mmlu/mmlu-full.sh).

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-xl}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-mmlu-full-${SIZE}}

TRAIN_FILE="${DATA_DIR}/data/mmlu_data/full/train.jsonl"
EVAL_FILES="${DATA_DIR}/data/mmlu_data/full/combined_valid.jsonl ${DATA_DIR}/data/mmlu_data/full/combined_test.jsonl"
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
    --eval_freq 150 --log_freq 4 \
    --total_steps 2000 --warmup_steps 50 --save_freq 10000000000 \
    --write_results \
    --task multiple_choice \
    --multiple_choice_train_permutations all \
    --multiple_choice_eval_permutations cyclic \
    --index_mode flat \
    --query_side_retriever_training \
    --load_index_path "${PRETRAINED_INDEX}"
