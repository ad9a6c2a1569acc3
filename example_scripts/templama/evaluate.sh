#!/bin/bash
# Evaluate a TempLAMA-finetuned Atlas against a given year's wiki snapshot —
# swap YEAR between train and eval to measure index-updatability (role parity:
# reference example_scripts/templama/evaluate.sh). Pass the year as $1.

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-xl}
YEAR=${1:-2017}
MODEL_TO_EVAL=${MODEL_TO_EVAL:?set MODEL_TO_EVAL to a checkpoint from templama/train.sh}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-templama-eval-${YEAR}-${SIZE}}

EVAL_FILES="${DATA_DIR}/data/templama_data/temp_lama.valid.${YEAR}.jsonl ${DATA_DIR}/data/templama_data/temp_lama.test.${YEAR}.jsonl"
PASSAGES="${DATA_DIR}/corpora/wiki/enwiki-dec${YEAR}/text-list-100-sec.jsonl ${DATA_DIR}/corpora/wiki/enwiki-dec${YEAR}/infobox.jsonl"

python evaluate.py \
    --name ${EXPERIMENT_NAME} \
    --generation_max_length 32 \
    --gold_score_mode ppmean \
    --precision bf16 \
    --reader_model_type google/t5-${SIZE}-lm-adapt \
    --text_maxlength 384 \
    --target_maxlength 32 \
    --model_path "${MODEL_TO_EVAL}" \
    --eval_data ${EVAL_FILES} \
    --per_gpu_batch_size 1 \
    --n_context 20 --retriever_n_context 20 \
    --checkpoint_dir ./checkpoint \
    --index_mode flat \
    --task qa \
    --passages ${PASSAGES} \
    --write_results \
    --qa_prompt_format "{question}"
