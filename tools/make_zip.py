"""Package pyppi_spark for spark-submit --py-files."""
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST = os.path.join(REPO, "dist")
os.makedirs(DIST, exist_ok=True)
out = os.path.join(DIST, "pyppi_spark.zip")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    pkg = os.path.join(REPO, "pyppi_spark")
    for root, _, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
print(out)
