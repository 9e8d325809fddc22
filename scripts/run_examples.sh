#!/usr/bin/env bash
# Reference-parity experiment launches (equivalent of the reference's run.sh).
# Point dataset.root_dir at your local dataset copies.
set -e

# zero-dataset smoke run: full SOLVE/EVAL/PLOT on the synthetic loader
python -m eincm_tpu.experiments --config configs/synthetic.yaml "$@"

# ECD slider_depth (run.sh:17-38)
python -m eincm_tpu.experiments --config configs/ecd_slider.yaml \
    dataset.root_dir=/data/ecd "$@"

# MVSEC indoor_flying1 (run.sh:41-72)
python -m eincm_tpu.experiments --config configs/mvsec_indoor.yaml \
    dataset.root_dir=/data/mvsec "$@"

# MVSEC outdoor_day1 (run.sh:73-97)
python -m eincm_tpu.experiments --config configs/mvsec_outdoor.yaml \
    dataset.root_dir=/data/mvsec "$@"

# DSEC test (run.sh:99-121), then benchmark submission export
python -m eincm_tpu.experiments --config configs/dsec_test.yaml \
    dataset.root_dir=/data/dsec "$@"
python -m eincm_tpu.tools.dsec_submission \
    --opt_results_path outputs/dsec_test/opt_results.npz \
    --eval_ts_path /data/dsec/Evaluation/test_forward_optical_flow_timestamps/zurich_city_12_a.csv \
    --output_dir outputs/dsec_test/submission
