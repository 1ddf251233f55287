"""Engine operators (SURVEY.md §2) re-expressed as DataFrame transforms.

Each module documents which reference operators it covers (file:line into
/root/reference) and how the Spark formulation scales past single-node.
"""
