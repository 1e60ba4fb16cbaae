#!/bin/sh
# Render a movie from a stored solution (the movie*.csh equivalent).
#
#   tools/movie.sh solutions/run1 movies/run1.mp4 [nframes] [fps]
#
set -e
PREFIX="$1"
OUT="$2"
NFRAMES="${3:-100}"
FPS="${4:-10}"
if [ -z "$PREFIX" ] || [ -z "$OUT" ]; then
    echo "usage: $0 <solution-prefix> <out.mp4> [nframes] [fps]" >&2
    exit 2
fi
TOOLDIR="$(dirname "$0")"
FRAMEDIR="$(mktemp -d)"
trap 'rm -rf "$FRAMEDIR"' EXIT
python "$TOOLDIR/moviemaker.py" -n "$NFRAMES" "$PREFIX" "$FRAMEDIR/f"
mkdir -p "$(dirname "$OUT")"
ffmpeg -y -r "$FPS" -i "$FRAMEDIR/f%04d.png" -pix_fmt yuv420p "$OUT"
echo "$OUT"
