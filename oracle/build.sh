#!/bin/sh
# Build the reference binaries and the instrumentation harness.
# The reference tree is mounted read-only at /root/reference; nothing from it
# is copied into this repository — these builds compile *against* it and the
# binaries are gitignored.
set -e
cd "$(dirname "$0")"
mkdir -p bin
REF=/root/reference
# canonical binary (README.md:50)
g++ $REF/Fasim-LongTarget.cpp $REF/ssw_cpp.cpp $REF/sswNew.cpp -O -msse2 -o bin/fasim
# legacy binary (correct multi-record FASTA parsing)
g++ $REF/fasim-LongTarget.cpp $REF/ssw_cpp.cpp $REF/sswNew.cpp -O -msse2 -o bin/fasim_legacy
# patched canonical binary for multi-record goldens: canonical algorithm with
# the legacy readDna reset fix (SURVEY.md §0, §4). The two-line patch is
# applied to a temp copy; the patched source is never kept.
TMP=$(mktemp -d)
sed 's/^        if(tmpStr\[0\]==.>.){$/        if(tmpStr[0]==0x3e){ tmpDNA=""; j=0;/' \
    $REF/Fasim-LongTarget.cpp > $TMP/patched.cpp
if ! cmp -s $TMP/patched.cpp $REF/Fasim-LongTarget.cpp; then
  g++ $TMP/patched.cpp $REF/ssw_cpp.cpp $REF/sswNew.cpp -O -msse2 -o bin/fasim_patched -I$REF
else
  echo "WARNING: readDna patch did not apply" >&2
fi
rm -rf $TMP
# instrumentation harness
g++ -O2 -msse2 -I$REF harness.cpp $REF/ssw_cpp.cpp $REF/sswNew.cpp -o bin/harness
echo OK
