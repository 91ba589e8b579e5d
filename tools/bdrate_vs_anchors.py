"""BD-rate of every learned family vs the classical JPEG/WebP anchors.

Joins the two committed artifacts —
  eval_results/rd_curves_natural.json   (learned 4-lambda curves, 24-image
                                         natural val set, measured bitstreams)
  eval_results/anchors_natural.json     (JPEG/WebP quality-ladder curves on
                                         the SAME images)
— into the standard "BD-rate vs JPEG" headline the reference cannot produce
(its eval artifact quotes bpp/PSNR in isolation,
/root/reference/eval_results/...txt:1-10). Negative = the learned family
needs fewer bits than the anchor at equal PSNR. Uses the MEASURED bitstream
bpp for the learned side (real files, not analytic rate).

Writes the table into eval_results/anchors_natural.json under
"bd_rate_vs_anchors" and prints it. Pure CPU — run any time after both
artifacts exist:  python tools/bdrate_vs_anchors.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from neural_image_compression_tpu.evaluation.bdrate import bd_rate

    curves_p = os.path.join(REPO, "eval_results", "rd_curves_natural.json")
    anchors_p = os.path.join(REPO, "eval_results", "anchors_natural.json")
    with open(curves_p) as f:
        curves = json.load(f)
    with open(anchors_p) as f:
        anchors = json.load(f)

    out = {}
    for fam, pts in curves["curves"].items():
        test = [{"bpp": p["measured_bpp"], "psnr": p["psnr"]} for p in pts]
        row = {}
        for name in ("jpeg", "webp"):
            try:
                row[f"bd_rate_pct_vs_{name}"] = round(
                    bd_rate(anchors[name], test), 2)
            except ValueError as e:  # no PSNR overlap
                row[f"bd_rate_pct_vs_{name}"] = f"no-overlap: {e}"
        out[fam] = row
        print(f"{fam:14s} {row}")

    anchors["bd_rate_vs_anchors"] = {
        "note": ("measured-bitstream learned curves (rd_curves_natural.json,"
                 f" {curves['config'].get('steps')} steps, clip "
                 f"{curves['config'].get('clip_grad_norm')}, "
                 f"{curves['config'].get('n_train')} unique train patches)"
                 " vs the anchor quality ladders on the same 24 images;"
                 " negative = fewer bits than the anchor at equal PSNR"),
        "families": out,
    }
    with open(anchors_p, "w") as f:
        json.dump(anchors, f, indent=1)
    print(f"-> {anchors_p} (bd_rate_vs_anchors)")


if __name__ == "__main__":
    main()
