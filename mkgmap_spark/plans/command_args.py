"""Command-line / options-file front end.

Reference: mkgmap/CommandArgsReader.java, Option.java, Options.java —
the argument model users drive the reference with: options and
filenames read LEFT TO RIGHT, each input file processed with the
options in force at its position; ``-c file`` / ``--read-config=file``
splice an options file (same grammar as style options: ``key=value``,
``key: value``, ``key { multi-line }``, bare flags, ``#`` comments);
``no-`` prefix resets an option, ``x-`` marks experimental;
``--input-file=`` equals a bare filename; ``latin1``/``unicode`` are
aliases for ``code-page=1252``/``65001``; ``drive-on-left/right``
translate to ``drive-on=``.

Mapname sequencing (CommandArgsReader.Filename.processArg): default
63240001; an 8-digit group in the filename becomes the mapname UNLESS
--mapname was ever given explicitly; after each file the mapname
increments (%08d).

The result maps 1:1 onto the engine's pipeline settings: one
(filename, option-snapshot) pair per input, ready to parameterize
build_tiles / style selection per file.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

_RE_DIGITS8 = __import__("re").compile(r"([0-9]{8})")

DEFAULT_OPTIONS = [
    ("mapname", "63240001"),
    ("description", "OSM street map"),
    ("overview-mapname", "osmmap"),
    ("overview-mapnumber", "63240000"),
    ("poi-address", ""),
    ("merge-lines", ""),
]


@dataclass
class Option:
    """Option.java: ``name[=|:]value``; ``no-`` reset, ``x-`` experimental."""

    option: str
    value: str | None = ""
    reset: bool = False
    experimental: bool = False

    @classmethod
    def parse(cls, optval: str) -> "Option":
        parts = __import__("re").split(r"[=:]", optval, maxsplit=1)
        if len(parts) > 1:
            name, val = parts[0].strip(), parts[1].strip()
        else:
            name, val = optval, ""
        reset = False
        if name.startswith("no-"):
            reset = True
            name = name[3:]
            val = None
        exp = False
        if name.startswith("x-"):
            exp = True
            name = name[2:]
        return cls(name, val, reset, exp)


def read_option_file(text: str, filename: str | None = None) -> list[Option]:
    """Options.readOptionFile: key=/: to EOL, key { .. } across lines
    (trimmed), bare flags, '#' comments; relative input-file values
    resolve against the option file's directory."""
    parent = os.path.dirname(filename) if filename else ""
    out: list[Option] = []
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i] in " \t\r\n":
            i += 1
        if i >= n:
            break
        if text[i] == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        j = i
        while j < n and (text[j].isalnum() or text[j] in "-_."):
            j += 1
        key = text[i:j]
        i = j
        while i < n and text[i] in " \t":
            i += 1
        if i < n and text[i] in "=:":
            i += 1
            j = text.find("\n", i)
            j = n if j < 0 else j
            val = text[i:j].strip()
            i = j
        elif i < n and text[i] == "{":
            i += 1
            j = text.find("}", i)
            j = n if j < 0 else j
            val = text[i:j].strip()
            i = j + 1
        elif key:
            val = ""
        else:
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if key == "input-file" and parent and not os.path.isabs(val):
            val = os.path.join(parent, val)
        out.append(Option.parse(f"{key}={val}") if val != "" or not key.startswith("no-")
                   else Option.parse(key))
    return out


@dataclass
class FileArgs:
    """One input file plus the option snapshot in force at its
    position."""

    name: str
    props: dict[str, str] = field(default_factory=dict)

    def get(self, key: str, default=None):
        return self.props.get(key, default)

    @property
    def mapname(self) -> str | None:
        return self.props.get("mapname")


@dataclass
class ParsedArgs:
    files: list[FileArgs]
    options: dict[str, str]  # final option state
    number_of_files: int = 0


def read_args(argv: list[str], read_file=None) -> ParsedArgs:
    """CommandArgsReader.readArgs over an argv list.

    ``read_file(path) -> str`` injects option-file contents (defaults
    to open()); each file is read at most once."""
    if read_file is None:
        def read_file(p):
            with open(p) as fh:
                return fh.read()

    arglist: list[tuple[str, object]] = [("opt", Option(k, v)) for k, v in DEFAULT_OPTIONS]
    mapname_was_set = False
    files_seen: set[str] = set()

    def add_option(opt: Option):
        nonlocal mapname_was_set
        # legacy translations
        if opt.option == "drive-on-left":
            opt = Option("drive-on", "left")
        elif opt.option == "drive-on-right":
            opt = Option("drive-on", "right")
        if opt.option == "mapname":
            mapname_was_set = True
        if opt.option == "input-file":
            if opt.value is not None:
                add_filename(opt.value)
        elif opt.option == "read-config":
            read_config(opt.value)
        elif opt.option == "latin1":
            arglist.append(("opt", Option("code-page", "1252")))
        elif opt.option == "unicode":
            arglist.append(("opt", Option("code-page", "65001")))
        else:
            arglist.append(("opt", opt))

    def add_filename(name: str):
        # filename-derived mapnames stop once --mapname appeared
        arglist.append(("file", (name, not mapname_was_set)))

    def read_config(path: str):
        key = os.path.abspath(path)
        if key in files_seen:
            return
        files_seen.add(key)
        for o in read_option_file(read_file(path), path):
            add_option(o)

    i = 0
    while i < len(argv):
        arg = argv[i]
        i += 1
        if arg.startswith("--"):
            add_option(Option.parse(arg[2:]))
        elif arg == "-c":
            read_config(argv[i])
            i += 1
        elif arg == "-n":
            add_option(Option("mapname", argv[i]))
            i += 1
        elif arg == "-v":
            add_option(Option("verbose"))
        elif arg.startswith("-"):
            pass  # unrecognised short option: warned and ignored
        else:
            add_filename(arg)

    # process in order
    args: dict[str, str] = {}
    files: list[FileArgs] = []
    for kind, payload in arglist:
        if kind == "opt":
            opt = payload
            if opt.reset:
                args.pop(opt.option, None)
            else:
                args[opt.option] = opt.value
        else:
            name, use_filename_as_mapname = payload
            if use_filename_as_mapname:
                m = _RE_DIGITS8.search(os.path.basename(name))
                if m:
                    args["mapname"] = m.group(1)
            files.append(FileArgs(name, dict(args)))
            # increment for the next file
            mapname = args.get("mapname")
            if mapname is not None:
                try:
                    args["mapname"] = "%08d" % (int(mapname) + 1)
                except ValueError:
                    args["mapname"] = "%8.8s" % mapname
    return ParsedArgs(files=files, options=args,
                      number_of_files=len(files))
