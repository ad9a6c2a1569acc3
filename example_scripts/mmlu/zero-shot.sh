#!/bin/bash
# Zero-shot MMLU evaluation with permutation de-biasing
# (role parity: reference example_scripts/mmlu README recipe; quality anchor:
# Atlas-xxl 36.87% / debiased 47.09%, README_MMLU.md:121-127).

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-xxl}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-mmlu-zeroshot-${SIZE}}

EVAL_FILES="${DATA_DIR}/data/mmlu_data/5-shot-multitask/combined_test.jsonl"
PRETRAINED_MODEL=${DATA_DIR}/models/atlas/${SIZE}_tpu
PASSAGES="${DATA_DIR}/corpora/wiki/enwiki-dec2021/text-list-100-sec.jsonl ${DATA_DIR}/corpora/wiki/enwiki-dec2021/infobox.jsonl"

python evaluate.py \
    --precision bf16 \
    --reader_model_type google/t5-${SIZE}-lm-adapt \
    --text_maxlength 384 \
    --model_path "${PRETRAINED_MODEL}" \
    --eval_data ${EVAL_FILES} \
    --per_gpu_batch_size 1 \
    --n_context 30 --retriever_n_context 30 \
    --name ${EXPERIMENT_NAME} \
    --checkpoint_dir ./checkpoint \
    --task multiple_choice \
    --multiple_choice_eval_permutations cyclic \
    --write_results \
    --passages ${PASSAGES}

python evaluation_scripts/evaluate_mmlu_predictions.py \
    --predictions_path ./checkpoint/${EXPERIMENT_NAME}/combined_test-step-0.jsonl \
    --gold_path ${EVAL_FILES}
