"""Nested parquet: list<T> / struct<...> read + assembly.

TPU-native equivalent of the reference's repetition/definition level
machinery (reference: cpp/src/lists/dremel.cu:1 level generation,
cpp/src/io/parquet/page_data.cu + decode_preprocess.cu nested decode):
rep/def level streams decode host-side (they are tiny RLE streams), the
offsets/validity reconstruction is vectorized numpy, and the value
buffers move to HBM once as flat Arrow-layout children.

Supported shapes (one nesting level, the dominant practical cases):
- list<primitive|string>: the standard 3-level schema
  (optional group (LIST) { repeated group list { <element> } })
- struct<primitive...>: group of leaves (independent column chunks whose
  def levels account for struct/field nullability)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from cudf_tpu import native
from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.io import thrift

_ENC_PLAIN, _ENC_PLAIN_DICT, _ENC_RLE_DICT = 0, 2, 8


@dataclass
class LeafInfo:
    path: Tuple[str, ...]        # dotted path of the leaf
    elem: "thrift.SchemaElement"
    max_def: int
    max_rep: int
    def_present: int             # def level meaning "value present"
    def_slot: int                # def level meaning "slot exists" (lists)


@dataclass
class FieldInfo:
    name: str
    kind: str                    # "leaf" | "list" | "struct"
    optional: bool
    leaves: List[LeafInfo]
    elem_optional: bool = False  # lists: element nullability
    field_names: Tuple[str, ...] = ()   # structs


@dataclass
class Node:
    """Schema-tree node for general-depth nested assembly (the dremel
    machinery of cpp/src/lists/dremel.cu + decode_preprocess.cu nesting
    info, host-side): rep = repetition depth (number of repeated
    ancestors incl. this list's own group), d_present = min def level at
    which this node is non-null, d_elem (lists) = min def level at which
    an element slot exists."""
    name: str
    kind: str                    # "leaf" | "list" | "struct"
    optional: bool
    rep: int
    d_present: int
    d_elem: int = 0
    children: List["Node"] = None
    leaf: Optional[LeafInfo] = None

    def leaves(self) -> List[LeafInfo]:
        if self.kind == "leaf":
            return [self.leaf]
        out = []
        for c in self.children:
            out.extend(c.leaves())
        return out


def schema_tree(schema: List["thrift.SchemaElement"]) -> List[Node]:
    """Parse the flattened pre-order schema into top-level Node trees of
    ARBITRARY nesting (list<list<T>>, struct<list>, list<struct>, map as
    list<struct<key,value>>)."""
    i = [1]                                   # schema[0] = root

    def take():
        el = schema[i[0]]
        i[0] += 1
        kids = []
        for _ in range(el.num_children):
            kids.append(take())
        return (el, kids)

    def build(el, kids, path, rep, d) -> Node:
        opt = el.repetition_type == 1
        repeated = el.repetition_type == 2
        if repeated:
            # a repeated node contributes one rep + one def level; the
            # enclosing (annotated) group supplies name/nullability
            raise AssertionError("repeated handled by parent")
        d_pres = d + (1 if opt else 0)
        if el.num_children == 0:
            leaf = LeafInfo(tuple(path + [el.name]), el, d_pres, rep,
                            d_pres, d_pres)
            return Node(el.name, "leaf", opt, rep, d_pres, leaf=leaf)
        # group: LIST/MAP (single repeated child) or plain struct
        if len(kids) == 1 and kids[0][0].repetition_type == 2:
            rep_el, rep_kids = kids[0]
            d_elem = d_pres + 1
            r2 = rep + 1
            p2 = path + [el.name, rep_el.name]
            if rep_el.num_children == 0:
                # legacy 2-level list: repeated leaf directly
                leaf = LeafInfo(tuple(p2), rep_el, d_elem, r2, d_elem,
                                d_elem)
                elem = Node(rep_el.name, "leaf", False, r2, d_elem,
                            leaf=leaf)
            elif len(rep_kids) == 1 and el.converted_type == 3:
                # standard 3-level LIST: element = the single child
                sub_el, sub_kids = rep_kids[0]
                elem = build_at(sub_el, sub_kids, p2, r2, d_elem)
            else:
                # MAP key_value group, or repeated group with several
                # children: element = struct of them
                kids2 = [build_at(se, sk, p2, r2, d_elem)
                         for se, sk in rep_kids]
                elem = Node(rep_el.name, "struct", False, r2, d_elem,
                            children=kids2)
            return Node(el.name, "list", opt, r2, d_pres, d_elem, [elem])
        kids2 = [build_at(se, sk, path + [el.name], rep, d_pres)
                 for se, sk in kids]
        return Node(el.name, "struct", opt, rep, d_pres, children=kids2)

    def build_at(el, kids, path, rep, d):
        if el.repetition_type == 2:
            # bare repeated group/leaf without an annotated wrapper:
            # synthesize a required list around it
            d_elem = d + 1
            r2 = rep + 1
            if el.num_children == 0:
                leaf = LeafInfo(tuple(path + [el.name]), el, d_elem, r2,
                                d_elem, d_elem)
                elem = Node(el.name, "leaf", False, r2, d_elem, leaf=leaf)
            else:
                kids2 = [build_at(se, sk, path + [el.name], r2, d_elem)
                         for se, sk in kids]
                elem = Node(el.name, "struct", False, r2, d_elem,
                            children=kids2)
            return Node(el.name, "list", False, r2, d, d_elem, [elem])
        return build(el, kids, path, rep, d)

    out = []
    while i[0] < len(schema):
        el, kids = take()
        out.append(build_at(el, kids, [], 0, 0))
    return out


def assemble_node(node: Node, streams: Dict[Tuple[str, ...], tuple]) -> Column:
    """Recursive general-depth assembly: per-leaf (values, defs, reps)
    streams → Column.  Works because every level shared between sibling
    leaves has identical def/rep prefixes, so any descendant leaf's
    stream drives offsets/validity at a shared node; leaves keep their
    own entry cadence through per-leaf selection masks (deeper lists
    give a leaf more entries per slot)."""
    sel_map = {leaf.path: np.ones(len(streams[leaf.path][1]), bool)
               for leaf in node.leaves()}
    return _assemble_with_sel(node, streams, sel_map)


def _assemble_with_sel(node: Node, streams, sel_map) -> Column:
    import jax.numpy as jnp

    if node.kind == "leaf":
        leaf = node.leaf
        values, defs, _ = streams[leaf.path]
        d = defs[sel_map[leaf.path]]
        present = d >= leaf.def_present
        n = len(d)
        mask = None if present.all() else present
        if isinstance(values, tuple):
            po, pc = values
            lens = np.zeros(n, np.int64)
            lens[present] = (po[1:] - po[:-1])
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=offs[1:])
            return Column(dt.STRING, n, data=jnp.asarray(pc),
                          offsets=jnp.asarray(offs),
                          validity=jnp.asarray(mask)
                          if mask is not None else None)
        full = np.zeros(n, dtype=values.dtype if getattr(values, "size", 0)
                        else np.float64)
        full[present] = values
        return Column.from_numpy(full, mask=mask)

    if node.kind == "struct":
        children = [_assemble_with_sel(c, streams, sel_map)
                    for c in node.children]
        # slot-axis entries of leaf0 = those with rep <= node.rep
        # (deeper-list continuations repeat WITHIN a slot)
        leaf0 = node.leaves()[0]
        _, defs, reps = streams[leaf0.path]
        m = sel_map[leaf0.path]
        d = defs[m]
        r = reps[m]
        slot = r <= node.rep
        mask = None
        if node.optional:
            pv = d[slot] >= node.d_present
            if not pv.all():
                mask = jnp.asarray(pv)
        n = children[0].length if children else int(slot.sum())
        fields = tuple((c_node.name, c.dtype)
                       for c_node, c in zip(node.children, children))
        return Column(dt.struct_dtype(fields), n, children=children,
                      validity=mask)

    # list node at repetition depth node.rep
    leaf0 = node.leaves()[0]
    _, defs0, reps0 = streams[leaf0.path]
    sel0 = sel_map[leaf0.path]
    d = defs0[sel0]
    r = reps0[sel0]
    ell = node.rep
    starts = r < ell                 # entry begins a parent-axis slot
    n_slots = int(starts.sum())
    slot_id = np.cumsum(starts) - 1
    elem_start = (r <= ell) & (d >= node.d_elem)
    counts = np.zeros(max(n_slots, 1), np.int64)
    np.add.at(counts, slot_id[elem_start], 1)
    counts = counts[:n_slots]
    offsets = np.zeros(n_slots + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    mask = None
    if node.optional:
        pv = d[starts] >= node.d_present
        if not pv.all():
            mask = jnp.asarray(pv)
    # recurse on entries belonging to existing elements (def >= d_elem)
    child_sel = {}
    for leaf in node.leaves():
        _, ldefs, _ = streams[leaf.path]
        child_sel[leaf.path] = sel_map[leaf.path] & (ldefs >= node.d_elem)
    col = _assemble_with_sel(node.children[0], streams, child_sel)
    return Column(dt.list_dtype(col.dtype), n_slots,
                  offsets=jnp.asarray(offsets), children=[col],
                  validity=mask)


def schema_fields(schema: List["thrift.SchemaElement"]) -> List[FieldInfo]:
    """Walk the flattened pre-order schema into top-level FieldInfos."""
    fields: List[FieldInfo] = []
    i = 1                         # schema[0] = root

    def take(idx):                # consume one element + its subtree
        el = schema[idx]
        idx += 1
        kids = []
        for _ in range(el.num_children):
            sub, idx = take(idx)
            kids.append(sub)
        return (el, kids), idx

    while i < len(schema):
        (el, kids), i = take(i)
        opt = el.repetition_type == 1
        if el.num_children == 0:
            md = 1 if opt else 0
            fields.append(FieldInfo(el.name, "leaf", opt, [
                LeafInfo((el.name,), el, md, 0, md, md)]))
        elif el.converted_type == 3 or (
                len(kids) == 1 and kids[0][0].repetition_type == 2):
            # LIST: group { repeated group { element } } (3-level) or the
            # legacy 2-level (repeated leaf directly)
            rep_el, rep_kids = kids[0]
            if rep_el.num_children == 0:
                elem_el, elem_opt = rep_el, False
                md = (1 if opt else 0) + 1
            else:
                elem_el = rep_kids[0][0]
                elem_opt = elem_el.repetition_type == 1
                md = (1 if opt else 0) + 1 + (1 if elem_opt else 0)
            leaf = LeafInfo((el.name, rep_el.name) if rep_el.num_children == 0
                            else (el.name, rep_el.name, elem_el.name),
                            elem_el, md, 1, md, md - (1 if elem_opt else 0))
            fields.append(FieldInfo(el.name, "list", opt, [leaf],
                                    elem_optional=elem_opt))
        else:
            # STRUCT of leaves
            leaves = []
            names = []
            base = 1 if opt else 0
            for sub_el, sub_kids in kids:
                if sub_el.num_children != 0:
                    raise NotImplementedError("nested-of-nested schema")
                sopt = sub_el.repetition_type == 1
                md = base + (1 if sopt else 0)
                leaves.append(LeafInfo((el.name, sub_el.name), sub_el,
                                       md, 0, md, md))
                names.append(sub_el.name)
            fields.append(FieldInfo(el.name, "struct", opt, leaves,
                                    field_names=tuple(names)))
    return fields


def _rle_levels(buf: bytes, bit_width: int, count: int) -> np.ndarray:
    if bit_width == 0:
        return np.zeros(count, np.int32)
    return native.rle_decode32(buf, bit_width, count)


def read_chunk_levels(path: str, cc: "thrift.ColumnChunkMeta",
                      leaf: LeafInfo):
    """One column chunk → (values, def_levels, rep_levels).

    values: ndarray (or (offsets, chars) for strings) holding ONLY the
    present entries (def == max_def), in level order.
    """
    from cudf_tpu.io.parquet_native import _decode_plain, _decompress

    phys = leaf.elem.type
    tl = leaf.elem.type_length or 0
    with open(path, "rb") as f:
        start = cc.dictionary_page_offset or cc.data_page_offset
        f.seek(start)
        raw = f.read(cc.total_compressed_size + (1 << 16))
    pos = 0
    dictionary = None
    vals_parts: List = []
    defs_parts: List[np.ndarray] = []
    reps_parts: List[np.ndarray] = []
    remaining = cc.num_values
    dbw = max(leaf.max_def.bit_length(), 1) if leaf.max_def else 0
    rbw = max(leaf.max_rep.bit_length(), 1) if leaf.max_rep else 0
    while remaining > 0 and pos < len(raw):
        ph = thrift.PageHeader.parse(raw, pos)
        pos += ph.header_len
        if ph.type == 3:
            lvl_len = ph.def_levels_byte_length + ph.rep_levels_byte_length
            lvl = raw[pos:pos + lvl_len]
            if ph.v2_is_compressed:
                body_c = raw[pos + lvl_len:pos + ph.compressed_page_size]
                payload = lvl + _decompress(
                    body_c, cc.codec, ph.uncompressed_page_size - lvl_len)
            else:
                payload = raw[pos:pos + ph.compressed_page_size]
        else:
            payload = _decompress(raw[pos:pos + ph.compressed_page_size],
                                  cc.codec, ph.uncompressed_page_size)
        pos += ph.compressed_page_size
        if ph.type == 2:
            dictionary = _decode_plain(payload, phys, ph.dict_num_values, tl)
            continue
        if ph.type not in (0, 3):
            raise NotImplementedError(f"page type {ph.type}")
        nv = ph.num_values
        if ph.type == 3:
            reps = _rle_levels(payload[:ph.rep_levels_byte_length], rbw, nv) \
                if leaf.max_rep else np.zeros(nv, np.int32)
            off = ph.rep_levels_byte_length
            defs = _rle_levels(
                payload[off:off + ph.def_levels_byte_length], dbw, nv) \
                if leaf.max_def else np.zeros(nv, np.int32)
            consumed = ph.rep_levels_byte_length + ph.def_levels_byte_length
        else:
            consumed = 0
            if leaf.max_rep:
                ln = int.from_bytes(payload[consumed:consumed + 4], "little")
                reps = _rle_levels(payload[consumed + 4:consumed + 4 + ln],
                                   rbw, nv)
                consumed += 4 + ln
            else:
                reps = np.zeros(nv, np.int32)
            if leaf.max_def:
                ln = int.from_bytes(payload[consumed:consumed + 4], "little")
                defs = _rle_levels(payload[consumed + 4:consumed + 4 + ln],
                                   dbw, nv)
                consumed += 4 + ln
            else:
                defs = np.zeros(nv, np.int32)
        body = payload[consumed:]
        n_present = int((defs == leaf.def_present).sum())
        if ph.encoding == _ENC_PLAIN:
            vals = _decode_plain(body, phys, n_present, tl)
        elif ph.encoding in (_ENC_RLE_DICT, _ENC_PLAIN_DICT):
            bw = body[0]
            idx = native.rle_decode32(body[1:], bw, n_present)
            if isinstance(dictionary, tuple):     # string dictionary
                do, dc = dictionary
                do = np.asarray(do)
                lens = (do[1:] - do[:-1])[idx]
                offs = np.zeros(n_present + 1, np.int64)
                np.cumsum(lens, out=offs[1:])
                chars = np.zeros(int(offs[-1]), np.uint8)
                dcb = np.asarray(dc)
                p = 0
                for k, ii in enumerate(idx):
                    ln = int(lens[k])
                    chars[p:p + ln] = dcb[do[ii]:do[ii] + ln]
                    p += ln
                vals = (offs, chars)
            else:
                vals = np.asarray(dictionary)[idx]
        else:
            raise NotImplementedError(f"nested encoding {ph.encoding}")
        vals_parts.append(vals)
        defs_parts.append(defs)
        reps_parts.append(reps)
        remaining -= nv
    defs = np.concatenate(defs_parts) if defs_parts else np.zeros(0, np.int32)
    reps = np.concatenate(reps_parts) if reps_parts else np.zeros(0, np.int32)
    if vals_parts and isinstance(vals_parts[0], tuple):
        offs = [np.asarray(vals_parts[0][0])]
        shift = offs[0][-1] if len(offs[0]) else 0
        for o, _ in vals_parts[1:]:
            offs.append(np.asarray(o[1:]) + shift)
            shift += o[-1]
        values = (np.concatenate(offs),
                  np.concatenate([c for _, c in vals_parts]))
    else:
        values = np.concatenate(vals_parts) if vals_parts else np.zeros(0)
    return values, defs, reps


def _values_column(values, defs, leaf: LeafInfo) -> Column:
    """Child value column over SLOTS (def >= def_slot): present values
    spread into slot positions, slot validity = (def == def_present)."""
    import jax.numpy as jnp

    slot = defs >= leaf.def_slot
    present = defs == leaf.def_present
    n_slots = int(slot.sum())
    pv = present[slot]
    mask = None if pv.all() else pv
    if isinstance(values, tuple):
        po, pc = values
        lens = np.zeros(n_slots, np.int64)
        lens[pv] = (po[1:] - po[:-1])
        offs = np.zeros(n_slots + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        return Column(dt.STRING, n_slots, data=jnp.asarray(pc),
                      offsets=jnp.asarray(offs),
                      validity=jnp.asarray(mask) if mask is not None else None)
    full = np.zeros(n_slots, dtype=values.dtype if values.size else np.float64)
    full[pv] = values
    return Column.from_numpy(full, mask=mask)


def assemble_list(values, defs, reps, field: FieldInfo) -> Column:
    """list<element> column from one leaf's (values, defs, reps)."""
    import jax.numpy as jnp

    leaf = field.leaves[0]
    new_row = reps == 0
    n_rows = int(new_row.sum())
    slot = defs >= leaf.def_slot
    # per-row slot counts → offsets
    row_id = np.cumsum(new_row) - 1
    counts = np.zeros(n_rows, np.int64)
    np.add.at(counts, row_id[slot], 1)
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    child = _values_column(values, defs, leaf)
    # list validity: the row's first level entry has def == 0 → null list
    null_def = 0 if field.optional else -1
    row_first_def = defs[new_row]
    lv = row_first_def != null_def
    mask = None if lv.all() else lv
    return Column(dt.list_dtype(child.dtype), n_rows,
                  offsets=jnp.asarray(offsets), children=[child],
                  validity=jnp.asarray(mask) if mask is not None else None)


def assemble_struct(parts: List[Tuple[np.ndarray, np.ndarray]],
                    field: FieldInfo) -> Column:
    """struct column from its leaves' (values, defs) pairs."""
    import jax.numpy as jnp

    children = []
    struct_valid = None
    for (values, defs), leaf in zip(parts, field.leaves):
        # slot exists for every row (max_rep == 0)
        present = defs == leaf.def_present
        n = len(defs)
        mask = None if present.all() else present
        if isinstance(values, tuple):
            po, pc = values
            lens = np.zeros(n, np.int64)
            lens[present] = (po[1:] - po[:-1])
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=offs[1:])
            col = Column(dt.STRING, n, data=jnp.asarray(pc),
                         offsets=jnp.asarray(offs),
                         validity=jnp.asarray(mask) if mask is not None else None)
        else:
            full = np.zeros(n, dtype=values.dtype if values.size
                            else np.float64)
            full[present] = values
            col = Column.from_numpy(full, mask=mask)
        children.append(col)
        if field.optional:
            sv = defs >= 1
            struct_valid = sv if struct_valid is None else (struct_valid | sv)
    n = children[0].length if children else 0
    fields = tuple((nm, c.dtype) for nm, c in zip(field.field_names, children))
    mask = None
    if field.optional and struct_valid is not None and not struct_valid.all():
        mask = jnp.asarray(struct_valid)
    return Column(dt.struct_dtype(fields), n, children=children,
                  validity=mask)
