"""Configuration system: JSON-backed nested parameters with read-side
defaults and self-documenting comments.

API-compatible re-implementation of the reference's ``ParameterDict``
(``src/liftreg/utils/module_parameters.py``): reading
``opt[('key', default, 'docstring')]`` materializes missing keys, records
the used value in a parallel ``int`` tree and the docstring in a ``com``
tree; ``load_JSON``/``write_ext_JSON``/``write_JSON``/``write_JSON_comments``
round-trip ``cur_task_setting.json`` files unchanged.
"""
from __future__ import annotations

import json


class ParameterDict:
    def __init__(self, init=None, printSettings=True):
        if init is not None and isinstance(init, ParameterDict):
            self.ext = init.ext
        elif isinstance(init, dict):
            self.ext = init
        else:
            self.ext = {}
        self.int = {}
        self.com = {}
        self.currentCategoryName = "root"
        self.printSettings = printSettings

    # -- IO -----------------------------------------------------------------
    def load_JSON(self, file_name):
        try:
            with open(file_name) as f:
                if self.printSettings:
                    print("Loading parameter file = " + str(file_name))
                self.ext = json.load(f)
        except IOError:
            print(f"Could not open file = {file_name}; ignoring request.")

    def write_JSON(self, file_name, save_int=True):
        with open(file_name, "w") as f:
            json.dump(self.int if save_int else self.ext, f, indent=4,
                      sort_keys=True)

    def write_ext_JSON(self, file_name):
        with open(file_name, "w") as f:
            json.dump(self.ext, f, indent=4, sort_keys=True)

    def write_JSON_comments(self, file_name):
        with open(file_name, "w") as f:
            json.dump(self.com, f, indent=4, sort_keys=True)

    def write_JSON_and_JSON_comments(self, file_names):
        self.write_JSON(file_names[0])
        self.write_JSON_comments(file_names[1])

    # -- plumbing -----------------------------------------------------------
    def print_settings_on(self):
        self.printSettings = True

    def print_settings_off(self):
        self.printSettings = False

    def get_print_settings(self):
        return self.printSettings

    def _child(self, key):
        child = ParameterDict(printSettings=self.printSettings)
        child.ext = self.ext[key]
        child.int = self.int.setdefault(key, {})
        child.com = self.com.setdefault(key, {})
        child.currentCategoryName = self.currentCategoryName + "." + str(key)
        return child

    def __contains__(self, key):
        return key in self.ext

    def __str__(self):
        return (f"ext = {self.ext}\nint = {self.int}\ncom = {self.com}\n"
                f"currentCategoryName = {self.currentCategoryName}\n")

    def as_dict(self):
        return self.ext

    # -- get ----------------------------------------------------------------
    def __getitem__(self, key_or_tuple):
        if isinstance(key_or_tuple, tuple):
            parts = key_or_tuple + (None, None)
            key, default, comment = parts[0], parts[1], parts[2]
            if len(key_or_tuple) > 3:
                raise ValueError("Tuple of incorrect size")
            return self._get(key, default, comment)
        return self._get(key_or_tuple)

    def _get(self, key, default=None, comment=None):
        if key in self.ext:
            value = self.ext[key]
            if isinstance(value, dict):
                if comment and "__doc__" not in self.com.setdefault(key, {}):
                    self.com[key]["__doc__"] = comment
                return self._child(key)
            self.int[key] = value
            if comment:
                self.com[key] = comment
            return value
        # materialize a default
        if default is None:
            default = {}
        if isinstance(default, dict):
            if default:
                raise ValueError("Cannot create a default key of type dict()")
            self.ext[key] = {}
            self.int[key] = {}
            self.com[key] = {"__doc__": comment} if comment else {}
            return self._child(key)
        self.ext[key] = default
        self.int[key] = default
        if comment:
            self.com[key] = comment
        if self.printSettings:
            print(f"Using default value = {default} for key = {key} of "
                  f"category = {self.currentCategoryName}")
        return default

    # -- set ----------------------------------------------------------------
    def __setitem__(self, key, value_tuple):
        comment = None
        if isinstance(value_tuple, tuple):
            if len(value_tuple) == 2:
                value, comment = value_tuple
            elif len(value_tuple) == 1:
                value, comment = {}, value_tuple[0]
            else:
                raise ValueError("Expected a 2-tuple as input")
        else:
            value = value_tuple

        if isinstance(value, ParameterDict):
            self.ext[key] = value.ext
            self.int[key] = {}
            self.com[key] = {}
            return
        if isinstance(value, dict):
            if value:
                raise ValueError("Can only add empty dictionaries")
            if key not in self.ext or not isinstance(self.ext[key], dict):
                self.ext[key] = {}
            self.int[key] = {}
            self.com[key] = {"__doc__": comment} if comment else {}
            return
        self.ext[key] = value
        self.int[key] = value
        if comment:
            self.com[key] = comment
