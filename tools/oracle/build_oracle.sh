#!/usr/bin/env bash
# Build the reference-codec conformance oracle from the read-only reference
# tree into /tmp/refbuild. The oracle binaries (refdec/refenc/pipe_oracle/
# dump_transform) are TEST FIXTURE GENERATORS only — nothing from the
# reference is linked into or shipped with the framework.
#
# Drivers and stubs in this directory are original code; reference sources
# are compiled unmodified (residual.cpp is UTF-16LE on disk and is
# transcoded first).
set -euo pipefail

REF=${REF:-/root/reference/fer_h264/fer_h264}
OUT=${OUT:-/tmp/refbuild}
HERE="$(cd "$(dirname "$0")" && pwd)"

mkdir -p "$OUT/CL"
cp "$REF"/*.cpp "$REF"/*.h "$OUT"/ 2>/dev/null || true
iconv -f UTF-16 -t UTF-8 "$REF/residual.cpp" > "$OUT/residual.cpp"

# Minimal portability stubs (replace Windows/OpenCL headers).
cat > "$OUT/stdafx.h" <<'EOF'
#pragma once
#include <stdio.h>
#include <stdlib.h>
EOF
cat > "$OUT/CL/cl.h" <<'EOF'
#pragma once
typedef void* cl_mem;
typedef void* cl_command_queue;
typedef void* cl_context;
typedef void* cl_kernel;
EOF
cp "$HERE"/main_decode.cpp "$HERE"/main_encode.cpp "$HERE"/openCL_stub.cpp \
   "$HERE"/dump_transform.cpp "$HERE"/pipe_oracle.cpp "$OUT"/
# The in-repo openCL_stub.cpp may lack the OpenCLEnabled definition line; ensure it.
grep -q OpenCLEnabled "$OUT/openCL_stub.cpp" || echo 'bool OpenCLEnabled = false;' >> "$OUT/openCL_stub.cpp"

CXXFLAGS="-O2 -w -fpermissive -I$OUT -include climits"
CODEC_SRC="nal.cpp fileIO.cpp rbsp_decoding.cpp rbsp_encoding.cpp rbsp_IO.cpp \
 h264_globals.cpp residual.cpp residual_tables.cpp expgolomb.cpp \
 headers_and_parameter_sets.cpp ref_frames.cpp intra.cpp inttransform.cpp \
 scaleTransform.cpp quantizationTransform.cpp mocomp.cpp mode_pred.cpp \
 moestimation.cpp h264_math.cpp openCL_stub.cpp"

cd "$OUT"
g++ $CXXFLAGS -o refdec main_decode.cpp $CODEC_SRC
g++ $CXXFLAGS -o refenc main_encode.cpp $CODEC_SRC
g++ $CXXFLAGS -o pipe_oracle pipe_oracle.cpp quantizationTransform.cpp \
    scaleTransform.cpp inttransform.cpp h264_globals.cpp h264_math.cpp \
    headers_and_parameter_sets.cpp rbsp_IO.cpp expgolomb.cpp residual.cpp \
    residual_tables.cpp
g++ $CXXFLAGS -o dump_transform dump_transform.cpp quantizationTransform.cpp \
    scaleTransform.cpp inttransform.cpp h264_globals.cpp h264_math.cpp \
    headers_and_parameter_sets.cpp rbsp_IO.cpp expgolomb.cpp residual.cpp \
    residual_tables.cpp
echo "oracle built: $OUT/{refdec,refenc,pipe_oracle,dump_transform}"
