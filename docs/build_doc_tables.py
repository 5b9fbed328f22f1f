r"""Auto-generates feature tables from the registries.

Capability parity with ``vp_suite/docs/build_doc_tables.py:18-71``: one table
each for models, datasets, losses/metrics, and model blocks, written as
markdown to ``docs/``.
"""
import sys
from pathlib import Path

DOCS = Path(__file__).parent
sys.path.insert(0, str(DOCS.parent))


def model_table():
    from vp_suite_tpu.models import MODEL_CLASSES
    lines = ["| ID | Model | Paper | Code | Matches reference | Actions |",
             "|---|---|---|---|---|---|"]
    for mid, cls in MODEL_CLASSES.items():
        lines.append(f"| `{mid}` | {cls.NAME} | {cls.PAPER_REFERENCE or '-'} | "
                     f"{cls.CODE_REFERENCE or '-'} | {cls.MATCHES_REFERENCE or '-'} | "
                     f"{'yes' if cls.CAN_HANDLE_ACTIONS else 'no'} |")
    return "\n".join(lines)


def dataset_table():
    from vp_suite_tpu.datasets import DATASET_CLASSES
    lines = ["| ID | Dataset | Downloadable | Frame shape | Action size |",
             "|---|---|---|---|---|"]
    for did, cls in DATASET_CLASSES.items():
        lines.append(f"| `{did}` | {cls.NAME} | {cls.IS_DOWNLOADABLE or '-'} | "
                     f"{cls.DATASET_FRAME_SHAPE} | {cls.ACTION_SIZE} |")
    return "\n".join(lines)


def measure_table():
    from vp_suite_tpu.measure import LOSS_CLASSES
    lines = ["| ID | Measure | Reference | Bigger is better | Optimal |",
             "|---|---|---|---|---|"]
    for mid, cls in LOSS_CLASSES.items():
        lines.append(f"| `{mid}` | {cls.NAME} | {cls.REFERENCE or '-'} | "
                     f"{cls.BIGGER_IS_BETTER} | {cls.OPT_VALUE} |")
    return "\n".join(lines)


def block_table():
    from vp_suite_tpu.model_blocks import MODEL_BLOCK_CLASSES
    lines = ["| Block | Paper | Code | Matches reference |", "|---|---|---|---|"]
    for cls in MODEL_BLOCK_CLASSES:
        lines.append(f"| {cls.NAME} | {cls.PAPER_REFERENCE or '-'} | "
                     f"{cls.CODE_REFERENCE or '-'} | {cls.MATCHES_REFERENCE or '-'} |")
    return "\n".join(lines)


def main():
    out = ["# vp-suite-tpu feature tables", "", "## Models", "", model_table(), "",
           "## Datasets", "", dataset_table(), "", "## Losses & metrics", "",
           measure_table(), "", "## Model blocks", "", block_table(), ""]
    (DOCS / "feature_tables.md").write_text("\n".join(out))
    print(f"wrote {DOCS / 'feature_tables.md'}")


if __name__ == "__main__":
    main()
