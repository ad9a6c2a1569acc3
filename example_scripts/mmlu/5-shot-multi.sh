#!/bin/bash
# MMLU 5-shot multitask: one finetune on the 57-domain combined 285-example
# train set, permutation de-biasing on (role parity: reference
# example_scripts/mmlu/mmlu-5-shot-multi.sh).

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-xl}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-mmlu-5shot-multi-${SIZE}}

TRAIN_FILE="${DATA_DIR}/data/mmlu_data/5-shot-multitask/train.jsonl"
EVAL_FILES="${DATA_DIR}/data/mmlu_data/5-shot-multitask/combined_valid.jsonl ${DATA_DIR}/data/mmlu_data/5-shot-multitask/combined_test.jsonl"
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
    --eval_freq 16 --log_freq 4 \
    --total_steps 250 --warmup_steps 25 --save_freq 10000000000 \
    --write_results \
    --task multiple_choice \
    --multiple_choice_train_permutations all \
    --multiple_choice_eval_permutations cyclic \
    --index_mode flat \
    --query_side_retriever_training \
    --load_index_path "${PRETRAINED_INDEX}"

# last in-training eval fires at step 240 (eval_freq 16 does not divide 250)
python evaluation_scripts/evaluate_mmlu_predictions.py \
    --predictions_path ./checkpoint/${EXPERIMENT_NAME}/combined_test-step-240.jsonl \
    --gold_path "${DATA_DIR}/data/mmlu_data/5-shot-multitask/combined_test.jsonl"
