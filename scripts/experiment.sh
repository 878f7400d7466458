#!/usr/bin/env bash
# Reproduction recipes for the paper/ablation experiments
# (equivalent of the reference's scripts/experiment.sh).
#
# Usage: bash scripts/experiment.sh <experiment> [seq...]
#   e.g. bash scripts/experiment.sh stereo_icra 09 10

set -e

EXP=${1:-stereo_icra}
shift || true
SEQS=${@:-"00 01 02 03 04 05 06 07 08 09 10"}

run() {
    local cfg=$1
    for seq in $SEQS; do
        python apis/run.py -d options/examples/default_configuration.yml \
            -c "options/examples/${cfg}.yml" -s "$seq" --no_confirm
    done
}

case "$EXP" in
    # ---- paper configurations -------------------------------------------
    stereo_icra)        run kitti_stereo_train_icra ;;
    stereo_extend)      run kitti_stereo_train_extend ;;
    mono_sc_icra)       run kitti_mono_sc_train_icra ;;
    mono_sc_extend)     run kitti_mono_sc_train_extend ;;
    # ---- ablations -------------------------------------------------------
    abl_best_n)         run ablation_correspondences_best_n ;;
    abl_uniform)        run ablation_correspondences_uniform ;;
    abl_depth_mono)     run ablation_depth_mono ;;
    abl_depth_mono_sc)  run ablation_depth_mono_sc ;;
    abl_full_res)       run ablation_img_res_full ;;
    abl_model_sel_flow) run ablation_model_sel_flow ;;
    abl_scale_iter)     run ablation_scale_iterative ;;
    abl_flow_online)    run ablation_self_flow_online ;;
    abl_flow_offline)   run ablation_self_flow_offline ;;
    abl_pnp)            run ablation_tracker_pnp ;;
    # ---- other datasets --------------------------------------------------
    tum)                run tum_rgbd_slam ;;
    robotcar)           run oxford_robotcar ;;
    adelaide)           run adelaide_driving ;;
    kitti_tracking)     run kitti_tracking ;;
    *)
        echo "unknown experiment: $EXP" >&2
        exit 1
        ;;
esac

# score KITTI runs:
# python tools/evaluation/odometry/eval_odom.py --result result/<exp>/0 \
#     --gt dataset/kitti_odom/gt_poses --align 6dof
