/* Native beam-walk kernel for deepex_spark.kernel.sentence_kernel.
 *
 * Implements exactly the walk enumeration of ``beam_search_ie`` (reference
 * kgm.py:358-421 semantics, as pinned by the Python implementation and the
 * kernel goldens/oracles): per-row stable argsort of the pruned attention
 * matrix, shared direction-free first hop per start node, directed beam
 * rounds with revisit/direction/cross-segment rules (bound hops always
 * allowed, emitted at the bound's stable full-row rank), score/len beam
 * prune with Python-stable ordering, then the min/max-len + threshold
 * filter, 'mean'/'sum' ranking transform, stable descending sort and
 * search_n cap.
 *
 * Float arithmetic is performed in the same order as the Python path
 * (score accumulation left-to-right, mean = score/len at append), so the
 * output is bit-identical — asserted by tests/test_cbeam_parity.py and the
 * driver's golden/oracle hashes.
 *
 * Pure CPython C API + buffer protocol; no numpy headers needed.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>
#include <stdlib.h>

#define MAX_N 256       /* matrix side; callers fall back to Python above this */
#define MASK_WORDS 4    /* 256-bit visited mask */

typedef struct {
    double score;
    double mean;
    uint64_t mask[MASK_WORDS];
    int32_t len;
    uint8_t visited;
    int16_t path[];     /* flexible: n entries max */
} Entry;

typedef struct {
    char *base;         /* entry pool */
    size_t esize;       /* bytes per entry (header + n*int16, aligned) */
    int n;              /* matrix side */
    int topk;
    const double *att;  /* n*n row-major */
    int16_t *order;     /* n*n per-row stable argsort (desc val, asc idx) */
    /* first-hop cache: per start node, count + entries stored in pool */
    int fh_count[MAX_N];
    char *fh_ent[MAX_N];
} Ctx;

static inline int mask_test(const uint64_t *m, int b) {
    return (int)((m[b >> 6] >> (b & 63)) & 1u);
}
static inline void mask_set(uint64_t *m, int b) {
    m[b >> 6] |= ((uint64_t)1) << (b & 63);
}

static inline Entry *ent_at(char *base, size_t esize, int i) {
    return (Entry *)(base + (size_t)i * esize);
}

/* ---- per-row stable argsort: descending value, ascending index on ties ---- */

typedef struct { double v; int16_t i; } VI;

static int cmp_vi(const void *a, const void *b) {
    const VI *x = (const VI *)a, *y = (const VI *)b;
    if (x->v > y->v) return -1;
    if (x->v < y->v) return 1;
    return (x->i < y->i) ? -1 : (x->i > y->i ? 1 : 0);
}

static void build_order(Ctx *c) {
    VI tmp[MAX_N];
    for (int r = 0; r < c->n; r++) {
        const double *row = c->att + (size_t)r * c->n;
        for (int j = 0; j < c->n; j++) { tmp[j].v = row[j]; tmp[j].i = (int16_t)j; }
        qsort(tmp, (size_t)c->n, sizeof(VI), cmp_vi); /* comparator ties by idx => stable-equivalent */
        int16_t *out = c->order + (size_t)r * c->n;
        for (int j = 0; j < c->n; j++) out[j] = tmp[j].i;
    }
}

/* ---- stable insertion sort of entry pool slice by mean desc (small m) ---- */

static void isort_entries(char *base, size_t esize, int m, char *scratch) {
    for (int i = 1; i < m; i++) {
        Entry *cur = ent_at(base, esize, i);
        double key = cur->mean;
        int j = i - 1;
        /* shift strictly-smaller entries right; equal keys keep order */
        if (ent_at(base, esize, j)->mean >= key) continue;
        memcpy(scratch, cur, esize);
        while (j >= 0 && ent_at(base, esize, j)->mean < key) {
            memcpy(ent_at(base, esize, j + 1), ent_at(base, esize, j), esize);
            j--;
        }
        memcpy(ent_at(base, esize, j + 1), scratch, esize);
    }
}

/* ---- first hop: direction-free, bound-free expansion of one start node ---- */

static int first_hop(Ctx *c, int node, char *out /* topk entries */, char *scratch) {
    const int n = c->n, topk = c->topk;
    const double *row = c->att + (size_t)node * n;
    const int16_t *ord = c->order + (size_t)node * n;
    int m = 0;
    for (int k = 0; k < n && m < topk; k++) {
        int tgt = ord[k];
        if (tgt == node) continue; /* mask0 has only the start node */
        double ns = row[tgt];
        Entry *e = ent_at(out, c->esize, m);
        e->score = ns;
        e->mean = ns / 2.0;
        memset(e->mask, 0, sizeof(e->mask));
        mask_set(e->mask, node);
        mask_set(e->mask, tgt);
        e->len = 2;
        e->visited = 0;
        e->path[0] = (int16_t)node;
        e->path[1] = (int16_t)tgt;
        m++;
    }
    isort_entries(out, c->esize, m, scratch);
    return m; /* already <= topk */
}

static int get_first_hop(Ctx *c, int node, char *scratch) {
    if (c->fh_ent[node] == NULL) {
        c->fh_ent[node] = c->base; /* claim topk slots from the pool cursor */
        c->base += (size_t)c->topk * c->esize;
        c->fh_count[node] = first_hop(c, node, c->fh_ent[node], scratch);
    }
    return c->fh_count[node];
}

/* ---- one directed (node, bound) walk; appends finished beam to res ---- */

typedef struct {
    char *data;       /* packed entries */
    size_t esize;
    int count;
    int cap;
} Pool;

static int pool_reserve(Pool *p, int extra) {
    if (p->count + extra > p->cap) {
        int ncap = p->cap ? p->cap * 2 : 1024;
        while (ncap < p->count + extra) ncap *= 2;
        char *nd = (char *)realloc(p->data, (size_t)ncap * p->esize);
        if (!nd) return -1;
        p->data = nd;
        p->cap = ncap;
    }
    return 0;
}

static int uni_beam(Ctx *c, int node, int bound, char *beam, char *newb,
                    char *scratch, Pool *res) {
    const int n = c->n, topk = c->topk;
    const size_t esize = c->esize;
    /* seed beam from the shared first-hop cache */
    int bcount = get_first_hop(c, node, scratch);
    memcpy(beam, c->fh_ent[node], (size_t)bcount * esize);
    const int dir_right = bound > node;
    const double bval_unused = 0.0; (void)bval_unused;

    for (;;) {
        int all_visited = 1;
        for (int i = 0; i < bcount; i++)
            if (!ent_at(beam, esize, i)->visited) { all_visited = 0; break; }
        if (all_visited) break;

        int m = 0;
        for (int i = 0; i < bcount; i++) {
            Entry *e = ent_at(beam, esize, i);
            int v = e->path[e->len - 1];
            if (v == bound) {
                Entry *o = ent_at(newb, esize, m++);
                memcpy(o, e, esize);
                o->visited = 1;
                continue;
            }
            int plen1 = e->len + 1;
            int last = v;
            int check_cross = (last != node) && (last != bound);
            int loc_last = (last < node) + (last < bound);
            const double *row = c->att + (size_t)v * n;
            const int16_t *ord = c->order + (size_t)v * n;
            int tempk = 0;
            for (int k = 0; k < n && tempk < topk; k++) {
                int tgt = ord[k];
                if (tgt != bound) {
                    if (dir_right ? (tgt <= v) : (tgt >= v)) continue;
                    if (check_cross &&
                        ((tgt < node) + (tgt < bound)) != loc_last) continue;
                }
                if (mask_test(e->mask, tgt)) continue;
                double ns = e->score + row[tgt];
                Entry *o = ent_at(newb, esize, m++);
                o->score = ns;
                o->mean = ns / (double)plen1;
                memcpy(o->mask, e->mask, sizeof(o->mask));
                mask_set(o->mask, tgt);
                o->len = plen1;
                o->visited = 0;
                memcpy(o->path, e->path, (size_t)e->len * sizeof(int16_t));
                o->path[e->len] = (int16_t)tgt;
                tempk++;
            }
        }
        isort_entries(newb, esize, m, scratch);
        bcount = m < topk ? m : topk;
        memcpy(beam, newb, (size_t)bcount * esize);
    }
    if (pool_reserve(res, bcount) < 0) return -1;
    memcpy(res->data + (size_t)res->count * esize, beam, (size_t)bcount * esize);
    res->count += bcount;
    return 0;
}

/* ---- final filter + stable desc sort by transformed score ---- */

typedef struct { double s; int idx; } SI;

static int cmp_si(const void *a, const void *b) {
    const SI *x = (const SI *)a, *y = (const SI *)b;
    if (x->s > y->s) return -1;
    if (x->s < y->s) return 1;
    return (x->idx < y->idx) ? -1 : (x->idx > y->idx ? 1 : 0);
}

static PyObject *beam_walks(PyObject *self, PyObject *args) {
    PyObject *att_obj, *segs_obj;
    int n, offset0, topk, dist_const, min_len, max_len, ranking_mean, search_n;
    double threshold;
    if (!PyArg_ParseTuple(args, "OiOiiiiidii", &att_obj, &n, &segs_obj,
                          &offset0, &topk, &dist_const, &min_len, &max_len,
                          &threshold, &ranking_mean, &search_n))
        return NULL;
    if (n < 1 || n > MAX_N) {
        PyErr_SetString(PyExc_ValueError, "matrix side out of range");
        return NULL;
    }
    if (topk < 1 || topk > 128) {
        PyErr_SetString(PyExc_ValueError, "topk out of range");
        return NULL;
    }
    Py_buffer view;
    if (PyObject_GetBuffer(att_obj, &view, PyBUF_C_CONTIGUOUS) < 0) return NULL;
    if (view.len != (Py_ssize_t)n * n * (Py_ssize_t)sizeof(double)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "attention buffer size mismatch");
        return NULL;
    }

    /* segs: list of list of local ints */
    if (!PyList_Check(segs_obj)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError, "segs must be a list of lists");
        return NULL;
    }

    Ctx ctx;
    memset(ctx.fh_ent, 0, sizeof(ctx.fh_ent));
    ctx.n = n;
    ctx.topk = topk;
    ctx.att = (const double *)view.buf;
    size_t esize = sizeof(Entry) + (size_t)n * sizeof(int16_t);
    esize = (esize + 15u) & ~(size_t)15u;
    ctx.esize = esize;
    ctx.order = (int16_t *)malloc((size_t)n * n * sizeof(int16_t));
    /* pool: first-hop cache for up to n nodes (topk entries each) */
    char *fh_pool = (char *)malloc((size_t)n * topk * esize);
    char *beam = (char *)malloc((size_t)topk * esize);
    char *newb = (char *)malloc((size_t)(topk * topk + topk) * esize);
    char *scratch = (char *)malloc(esize);
    Pool res = {NULL, esize, 0, 0};
    if (!ctx.order || !fh_pool || !beam || !newb || !scratch) {
        PyErr_NoMemory();
        goto fail;
    }
    ctx.base = fh_pool;
    build_order(&ctx);

    {
        Py_ssize_t nsegs = PyList_GET_SIZE(segs_obj);
        for (Py_ssize_t si = 0; si < nsegs; si++) {
            PyObject *seg = PyList_GET_ITEM(segs_obj, si);
            if (!PyList_Check(seg)) {
                PyErr_SetString(PyExc_TypeError, "segs must be a list of lists");
                goto fail;
            }
            Py_ssize_t slen = PyList_GET_SIZE(seg);
            for (Py_ssize_t i = 0; i < slen; i++) {
                long u = PyLong_AsLong(PyList_GET_ITEM(seg, i));
                if (u < 0 || u >= n) {
                    PyErr_SetString(PyExc_ValueError, "segment index out of range");
                    goto fail;
                }
                for (Py_ssize_t j = i - 1; j >= 0 && j >= i - dist_const; j--) {
                    long b = PyLong_AsLong(PyList_GET_ITEM(seg, j));
                    if (b < 0 || b >= n) {
                        PyErr_SetString(PyExc_ValueError, "segment index out of range");
                        goto fail;
                    }
                    if (uni_beam(&ctx, (int)u, (int)b, beam, newb, scratch, &res) < 0) {
                        PyErr_NoMemory();
                        goto fail;
                    }
                }
                for (Py_ssize_t j = i + 1; j <= i + dist_const && j < slen; j++) {
                    long b = PyLong_AsLong(PyList_GET_ITEM(seg, j));
                    if (b < 0 || b >= n) {
                        PyErr_SetString(PyExc_ValueError, "segment index out of range");
                        goto fail;
                    }
                    if (uni_beam(&ctx, (int)u, (int)b, beam, newb, scratch, &res) < 0) {
                        PyErr_NoMemory();
                        goto fail;
                    }
                }
            }
        }
    }

    /* filter + transform + stable desc sort + cap */
    {
        SI *keep = (SI *)malloc((size_t)(res.count ? res.count : 1) * sizeof(SI));
        if (!keep) { PyErr_NoMemory(); goto fail; }
        int nk = 0;
        for (int i = 0; i < res.count; i++) {
            Entry *e = ent_at(res.data, esize, i);
            int L = e->len;
            if (L < min_len || L > max_len) continue;
            double s = ranking_mean ? e->score / (double)L : e->score;
            if (s > threshold) { keep[nk].s = s; keep[nk].idx = i; nk++; }
        }
        qsort(keep, (size_t)nk, sizeof(SI), cmp_si);
        if (search_n >= 0 && nk > search_n) nk = search_n;

        PyObject *out = PyList_New(nk);
        if (!out) { free(keep); goto fail; }
        for (int i = 0; i < nk; i++) {
            Entry *e = ent_at(res.data, esize, keep[i].idx);
            PyObject *path = PyTuple_New(e->len);
            if (!path) { free(keep); Py_DECREF(out); goto fail; }
            for (int j = 0; j < e->len; j++) {
                PyObject *v = PyLong_FromLong((long)e->path[j] + offset0);
                if (!v) { free(keep); Py_DECREF(path); Py_DECREF(out); goto fail; }
                PyTuple_SET_ITEM(path, j, v);
            }
            PyObject *pair = PyTuple_New(2);
            if (!pair) { free(keep); Py_DECREF(path); Py_DECREF(out); goto fail; }
            PyTuple_SET_ITEM(pair, 0, path);
            PyObject *sv = PyFloat_FromDouble(keep[i].s);
            if (!sv) { free(keep); Py_DECREF(pair); Py_DECREF(out); goto fail; }
            PyTuple_SET_ITEM(pair, 1, sv);
            PyList_SET_ITEM(out, i, pair);
        }
        free(keep);
        free(ctx.order); free(fh_pool); free(beam); free(newb); free(scratch);
        free(res.data);
        PyBuffer_Release(&view);
        return out;
    }

fail:
    free(ctx.order); free(fh_pool); free(beam); free(newb); free(scratch);
    free(res.data);
    PyBuffer_Release(&view);
    return NULL;
}

static PyMethodDef Methods[] = {
    {"beam_walks", beam_walks, METH_VARARGS,
     "beam_walks(att, n, segs_local, offset0, topk, dist_const, min_len, "
     "max_len, threshold, ranking_mean, search_n) -> [(path_tuple, score)]"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_cbeam", NULL, -1, Methods,
};

PyMODINIT_FUNC PyInit__cbeam(void) { return PyModule_Create(&moduledef); }
