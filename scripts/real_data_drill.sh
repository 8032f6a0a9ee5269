#!/usr/bin/env bash
# Real-data drill (VERDICT r3 item 4): one command from the released GOAT
# checkpoint to an R2R val_unseen SR/SPL table.  Matterport data is not in
# this image; when a DATA mount (layout: DATA.md) is present this runs
# with NO code changes:
#
#   DATA=/path/to/DATA bash scripts/real_data_drill.sh
#
# Steps:
#   1. layout check  — every required file, with the exact missing paths
#   2. key audit     — the converter's accepted key set vs the released
#                      .pt's exact key list (scripts/audit_ckpt_keys.py)
#   3. greedy decode — val_unseen through the jitted rollout on the chip,
#                      SR/SPL/nDTW/SDTW printed + submission JSON written
#
# Flags mirror run_r2r_goat.sh:30-67 (full causal config).  Use
# CKPT=path to point at a different released checkpoint.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA="${DATA:?set DATA=/path/to/DATA (layout: DATA.md)}"
CKPT="${CKPT:-$DATA/pretrained/model_step_best_42000.pt}"
OUT="${OUT:-out/real_data_drill}"

echo "== 1/3 layout check =="
missing=0
for f in \
    "$DATA/connectivity" \
    "$DATA/R2R/annotations/R2R_val_unseen_roberta_enc.json" \
    "$DATA/R2R/features/clip_vit_b16.hdf5" \
    "$DATA/zdicts/image_z_dict_clip_50.tsv" \
    "$DATA/zdicts/r2r_z_instr_dict.tsv" \
    "$DATA/zdicts/r2r_cfp_features.tsv" \
    "$CKPT"; do
  if [ ! -e "$f" ]; then echo "  MISSING $f"; missing=1; else echo "  ok $f"; fi
done
[ "$missing" = 0 ] || { echo "layout incomplete — see DATA.md"; exit 1; }

echo "== 2/3 checkpoint key audit =="
python scripts/audit_ckpt_keys.py --ckpt "$CKPT"

echo "== 3/3 greedy decode val_unseen =="
python -m vln_goat_tpu.cli --mode valid --dataset r2r \
    --output_dir "$OUT" \
    --connectivity_dir "$DATA/connectivity" \
    --anno_dir "$DATA/R2R/annotations" \
    --img_ft_file "$DATA/R2R/features/clip_vit_b16.hdf5" \
    --img_zdict_file "$DATA/zdicts/image_z_dict_clip_50.tsv" \
    --instr_zdict_file "$DATA/zdicts/r2r_z_instr_dict.tsv" \
    --front_feat_file "$DATA/zdicts/r2r_cfp_features.tsv" \
    --do_back_txt --do_back_img --do_back_txt_type type_2 \
    --do_back_img_type type_1 --do_add_method door \
    --do_front_txt --do_front_img --do_front_his \
    --bert_ckpt_file "$CKPT" \
    --batch_size 64 --submit
echo "done — metrics above; predictions in $OUT/submit_val_unseen.json"
echo "record SR/SPL in BASELINE.md ('R2R val_unseen SR / SPL' row)"
