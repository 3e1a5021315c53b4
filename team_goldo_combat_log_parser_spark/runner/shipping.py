"""Build the --py-files artifact for spark-submit deployment.

The reference ships as an App Engine app (reference app.yaml); the Spark
re-expression ships as a zip of this package passed to
``spark-submit --py-files`` (north-rule deployment shape): the driver
imports the package from the zip, and Spark distributes the same zip to
every executor's Python workers — no repo checkout needed on the
cluster.
"""

from __future__ import annotations

import os
import zipfile

_PKG = "team_goldo_combat_log_parser_spark"


def make_pyfiles_zip(repo_root: str, out_path: str) -> str:
    """Zip the package (sans __pycache__) with archive paths rooted at
    the package name, the layout ``--py-files`` expects. Deterministic
    content order (sorted walk) so repeated builds of the same tree are
    byte-identical — a deployment artifact you can checksum."""
    pkg_dir = os.path.join(repo_root, _PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in sorted(os.walk(pkg_dir)):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if f.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(_PKG, os.path.relpath(full, pkg_dir))
                # fixed timestamp => byte-identical rebuilds
                info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
                with open(full, "rb") as fh:
                    zf.writestr(info, fh.read())
    return out_path
