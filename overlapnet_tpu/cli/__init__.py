"""Command-line entry points (the reference's demo/ and src/two_heads scripts).

Run as ``python -m overlapnet_tpu.cli <command> [args]``; see __main__.py.
"""
