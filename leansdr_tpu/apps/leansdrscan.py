"""leansdrscan-compatible acquisition supervisor (reference
leansdrscan.cc).

Takes a command template whose fields may contain comma-separated
alternatives, iterates the cartesian product, runs each candidate command
bridging stdin/stdout, kills a candidate after --timeout seconds without
output, and on success either keeps streaming (live mode) or rewinds the
input file and re-executes the winning command (--rewind).

Usage:
  python -m leansdr_tpu.apps.leansdrscan [-t SECONDS] [--rewind] \\
      command [args with,commas ...] < capture.iq > out.ts
"""

import itertools
import os
import select
import subprocess
import sys
import time


def expand(args):
    """Cartesian product of comma-alternatives (field::iterate,
    leansdrscan.cc:28-37)."""
    choices = [a.split(",") for a in args]
    for combo in itertools.product(*choices):
        yield list(combo)


def run_candidate(cmd, timeout, rewind):
    """run_program (leansdrscan.cc:62-158): bridge stdin -> child ->
    stdout with a no-output watchdog. Returns True once the child has
    produced output (success)."""
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE)
    stdin_fd = sys.stdin.buffer.fileno()
    out_fd = proc.stdout.fileno()
    success = False
    last_output = time.time()
    stdin_open = True
    try:
        while True:
            rlist = [out_fd]
            if stdin_open and proc.stdin:
                # Only read more input when the child pipe can take it.
                rlist.append(stdin_fd)
            r, _, _ = select.select(rlist, [], [], 0.5)
            if stdin_fd in r:
                data = os.read(stdin_fd, 65536)
                if not data:
                    stdin_open = False
                    proc.stdin.close()
                else:
                    try:
                        proc.stdin.write(data)
                        proc.stdin.flush()
                    except BrokenPipeError:
                        break
            if out_fd in r:
                data = os.read(out_fd, 65536)
                if data:
                    success = True
                    last_output = time.time()
                    if rewind:
                        break      # will re-run the winner from the start
                    sys.stdout.buffer.write(data)
                    sys.stdout.buffer.flush()
                elif not stdin_open:
                    break
            if not success and time.time() - last_output > timeout:
                break
            if proc.poll() is not None and not success:
                break
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()
    return success


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    timeout = 2.0
    rewind = False
    i = 0
    while i < len(argv) and argv[i].startswith("-"):
        if argv[i] in ("-t", "--timeout"):
            i += 1
            timeout = float(argv[i])
        elif argv[i] == "--rewind":
            rewind = True
        elif argv[i] in ("-v", "-d"):
            pass
        else:
            print(f"** Error while processing '{argv[i]}'", file=sys.stderr)
            return 1
        i += 1
    template = argv[i:]
    if not template:
        print(__doc__, file=sys.stderr)
        return 1

    while True:
        for cmd in expand(template):
            print(f"Trying: {' '.join(cmd)}", file=sys.stderr)
            if rewind:
                try:
                    os.lseek(sys.stdin.buffer.fileno(), 0, os.SEEK_SET)
                except OSError:
                    pass
            if run_candidate(cmd, timeout, rewind):
                if rewind:
                    # Reprocess the whole file with the winner
                    # (leansdrscan.cc:187-199).
                    os.lseek(sys.stdin.buffer.fileno(), 0, os.SEEK_SET)
                    os.execvp(cmd[0], cmd)
                return 0
        if rewind:
            return 1    # all candidates failed on a finite file


if __name__ == "__main__":
    sys.exit(main())
