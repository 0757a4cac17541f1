"""Render e2e_pipeline results.json into Table-I/II markdown rows.

Usage: python scripts/table_report.py exps/e2e_r2/results.json
"""
import json
import sys

ORDER_I = ["vae_mono", "vae_aug", "ddpm_mono", "ddpm_aug", "trafficsim",
           "ctg", "ours", "ours_guidance", "ours_v2", "ours_v2_guidance",
           "ours_v2_guidance_heavy", "ours_v3", "ours_v3_guidance"]
ORDER_II = ["vae_aug", "ddpm_aug", "trafficsim", "ctg", "ours",
            "ours_guidance", "ours_v2", "ours_v2_guidance",
            "ours_v2_cli", "ours_v2_cli_guidance", "ours_v2_strict",
            "ours_v2_guidance_strict", "ours_v3", "ours_v3_guidance"]
LABEL = {"vae_mono": "VAE", "vae_aug": "VAE (aug)", "ddpm_mono": "DDPM",
         "ddpm_aug": "DDPM (aug)", "trafficsim": "TrafficSim", "ctg": "CTG",
         "ours": "Ours (ref-exact DPP-only recipe)",
         "ours_guidance": "Ours+guidance (ref-exact recipe)",
         "ours_v2": "Ours (STL-hinge recipe)",
         "ours_v2_guidance": "Ours+guidance",
         "ours_v2_guidance_heavy": "Ours+guidance (all-steps x3)",
         "ours_v2_cli": "Ours (25-scene CLI protocol)",
         "ours_v2_cli_guidance": "Ours+guidance (25-scene CLI protocol)",
         "ours_v2_strict": "Ours (STRICT ref semantics)",
         "ours_v2_guidance_strict": "Ours+guidance (STRICT ref semantics)",
         "ours_v3": "Ours (v3: longer e5)",
         "ours_v3_guidance": "Ours+guidance (v3, all-steps x3)"}


def main(path):
    r = json.load(open(path))
    print(f"trajopt (oracle) dataset satisfaction: "
          f"{r.get('trajopt_sat', float('nan')):.3f}\n")
    print("## Open-loop (Table I analogue)\n")
    print("| method | Success ↑ | Compliance ↑ | Valid area ↑ | Entropy ↑ "
          "| hull vol ↑ | minADE ↓ | Time (s) ↓ |")
    print("|---|---|---|---|---|---|---|---|")
    tj_done = False
    for k in ORDER_I:
        d = r.get(f"openloop_{k}")
        if not d:
            continue
        if not tj_done:
            print(f"| TrajOpt (oracle ref row) | {d['tj_scene_acc']:.3f} | "
                  f"{d['tj_acc']:.3f} | {d['tj_area']:.1f} | "
                  f"{d.get('tj_ent_ent_s', float('nan')):.2f} | "
                  f"{d['tj_vol']:.0f} | {d['tj_ade']:.1f} | – |")
            tj_done = True
        print(f"| {LABEL[k]} | {d['nn_scene_acc']:.3f} | {d['nn_acc']:.3f} "
              f"| {d['nn_area']:.1f} | "
              f"{d.get('nn_ent_ent_s', float('nan')):.2f} | "
              f"{d['nn_vol']:.0f} | {d['nn_ade']:.1f} | {d['time']:.3f} |")
    print("\n## Closed-loop (Table II analogue, 25 held-out scenes)\n")
    print("| method | Compliance ↑ | Valid area ↑ | Progress ↑ | "
          "Collision ↓ | Out-of-lane ↓ | Time (s/step, 25-scene batch) ↓ |")
    print("|---|---|---|---|---|---|---|")
    for k in ORDER_II:
        d = r.get(f"closedloop_{k}")
        if not d:
            continue
        print(f"| {LABEL[k]} | {d['compliance']:.3f} | {d['area']:.1f} | "
              f"{d['progress']:.1f} | {d['collision']:.3f} | "
              f"{d['out_of_lane']:.3f} | {d['plan_s_per_step_batch']:.3f} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "exps/e2e_r2/results.json")
