"""Replicates the reference benchmark table configs
(old/examples/benchmarks.py) on TPU. See bench.py for the driver metric.
"""
import subprocess
import sys

subprocess.run([sys.executable, "bench.py"])
