"""Checkpoint / plans surgery utilities.

Reference behaviour (re-derived):
  /root/reference/3D/rename_layers.py:12-23 — bulk-rename state_dict keys
    (unetr_pp → d_lka_former) in a torch checkpoint.
  /root/reference/3D/change_plans.py — edit a field in a plans pickle.
  /root/reference/2D/copy_model_weights.py — duplicate decoder LKA layer
    weights under a second layer name (used when widening the decoder).
"""

from __future__ import annotations

import argparse
import json


def rename_keys(argv=None):
    """Rename key prefixes in a torch checkpoint (rename_layers.py)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--old", default="unetr_pp")
    ap.add_argument("--new", default="d_lka_former")
    args = ap.parse_args(argv)
    import torch
    obj = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    renamed = {k.replace(args.old, args.new): v for k, v in sd.items()}
    if isinstance(obj, dict) and "state_dict" in obj:
        obj["state_dict"] = renamed
    else:
        obj = renamed
    torch.save(obj, args.output)
    print(f"renamed {sum(args.old in k for k in sd)} keys -> {args.output}")


def change_plans(argv=None):
    """Edit one field in a plans file (change_plans.py). Works on this
    framework's JSON plans and on pickled reference plans."""
    ap = argparse.ArgumentParser()
    ap.add_argument("plans_file")
    ap.add_argument("key", help="dot-path, e.g. plans_per_stage.0.batch_size")
    ap.add_argument("value", help="JSON-parsed value")
    ap.add_argument("--output", default=None)
    args = ap.parse_args(argv)
    value = json.loads(args.value)
    if args.plans_file.endswith(".json"):
        plans = json.loads(open(args.plans_file).read())
    else:
        import pickle
        plans = pickle.load(open(args.plans_file, "rb"))
    node = plans
    parts = args.key.split(".")
    for p in parts[:-1]:
        node = node[int(p)] if isinstance(node, (list, tuple)) else node[p]
    last = parts[-1]
    if isinstance(node, list):
        node[int(last)] = value
    else:
        node[last] = value
    out = args.output or args.plans_file
    if out.endswith(".json"):
        open(out, "w").write(json.dumps(plans, indent=2, default=str))
    else:
        import pickle
        pickle.dump(plans, open(out, "wb"))
    print(f"set {args.key} = {value} -> {out}")


def copy_decoder_weights(argv=None):
    """Duplicate decoder layer weights under a new layer name
    (copy_model_weights.py)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--src", default="layer_lka_1")
    ap.add_argument("--dst", default="layer_lka_2")
    args = ap.parse_args(argv)
    import torch
    obj = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    added = {}
    for k, v in sd.items():
        if args.src in k:
            nk = k.replace(args.src, args.dst)
            if nk not in sd:
                added[nk] = v.clone() if hasattr(v, "clone") else v
    sd.update(added)
    torch.save(obj if isinstance(obj, dict) and "state_dict" in obj
               else sd, args.output)
    print(f"copied {len(added)} tensors {args.src} -> {args.dst}")


if __name__ == "__main__":
    import sys
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    fns = {"rename_keys": rename_keys, "change_plans": change_plans,
           "copy_decoder_weights": copy_decoder_weights}
    if cmd in fns:
        fns[cmd](sys.argv[2:])
    else:
        print(f"usage: tools.py [{'|'.join(fns)}] ...")
