"""CLI entry points mirroring the reference's scripts (SURVEY.md §1):

  multibox-train             ← ref:train.py
  multibox-detect            ← ref:detect.py
  multibox-eval              ← ref:eval.py
  multibox-export            ← ref:export.py
  multibox-priors            ← ref:priors.py (generation script)
  multibox-visualize         ← ref:visualize.py (val-set prediction viz)
  multibox-visualize-inputs  ← ref:visualize_inputs.py (augmentation viz)
  multibox-dataset           ← companion tfrecords builder repo (C14)

Each is also runnable as ``python -m multibox_tpu.cli.<name>``.
"""
