#!/usr/bin/env bash
# Build the JVM media-decode jar (engine/java/mediadec -> dist/mediadec.jar).
# Same toolchain as build_minicat.sh: JDK + the pyspark jars already present.
set -euo pipefail
cd "$(dirname "$0")/.."
SPARK_JARS="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
BUILD=$(mktemp -d)
trap 'rm -rf "$BUILD"' EXIT
javac -encoding UTF-8 -proc:none -cp "$SPARK_JARS/*" -d "$BUILD" engine/java/mediadec/*.java
mkdir -p dist
jar cf dist/mediadec.jar -C "$BUILD" mediadec
echo "wrote dist/mediadec.jar ($(stat -c%s dist/mediadec.jar) bytes)"
