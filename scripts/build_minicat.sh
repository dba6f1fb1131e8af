#!/usr/bin/env bash
# Build the MiniCatalog DSv2 jar (engine/java/minicat -> dist/minicat.jar).
# Requires only the JDK and the pyspark jars already in the environment.
set -euo pipefail
cd "$(dirname "$0")/.."
SPARK_JARS="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
BUILD=$(mktemp -d)
trap 'rm -rf "$BUILD"' EXIT
javac -encoding UTF-8 -proc:none -cp "$SPARK_JARS/*" -d "$BUILD" engine/java/minicat/*.java
mkdir -p dist
jar cf dist/minicat.jar -C "$BUILD" minicat
echo "wrote dist/minicat.jar ($(stat -c%s dist/minicat.jar) bytes)"
