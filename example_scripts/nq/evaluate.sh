#!/bin/bash
# NQ dev+test evaluation of a finetuned Atlas from a prebuilt index
# (role parity: reference example_scripts/nq/evaluate.sh — same recipe, TPU launch;
# quality anchor: test EM ~38 for large, reference README.md:201).
#
# On a multi-host TPU slice, launch this same command on every host; jax discovers
# the topology from the scheduler's env.

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-xl}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-nq-eval-${SIZE}}

EVAL_FILES="${DATA_DIR}/data/nq_data/dev.jsonl ${DATA_DIR}/data/nq_data/test.jsonl"
# finetuned model + matching prebuilt index (converted via tools/convert_torch_artifacts.py);
# swap in models/atlas/${SIZE}_tpu + indices/atlas/wiki for the un-finetuned variant
PRETRAINED_MODEL=${DATA_DIR}/models/atlas_nq/${SIZE}_tpu
PRETRAINED_INDEX=${DATA_DIR}/indices/atlas_nq/wiki/${SIZE}

python evaluate.py \
    --name ${EXPERIMENT_NAME} \
    --generation_max_length 32 \
    --gold_score_mode ppmean \
    --precision bf16 \
    --reader_model_type google/t5-${SIZE}-lm-adapt \
    --text_maxlength 512 \
    --target_maxlength 16 \
    --model_path "${PRETRAINED_MODEL}" \
    --load_index_path "${PRETRAINED_INDEX}" \
    --eval_data ${EVAL_FILES} \
    --per_gpu_batch_size 1 \
    --n_context 40 --retriever_n_context 40 \
    --checkpoint_dir ./checkpoint \
    --index_mode flat \
    --task qa \
    --write_results
