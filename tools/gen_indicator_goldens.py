#!/usr/bin/env python3
"""Golden generator for IndicatorGoldenSpec (driver-side only; NOT part
of the Spark library). Implements TA-Lib's published algorithms
(ta-lib.org C-source semantics: SMA-seeded EMA, first-n-mean-seeded
Wilder RSI/ATR, Wilder-sum ADX, -DM-seeded two-bar-clamp SAR) as an
independent float64 fold over a RATIONAL series (no libm calls, so
Python and the JVM construct bit-identical inputs), plus this repo's
engine conventions as comparison folds to measure the post-warm-up
residuals quoted in the spec. The printed literals are hard-coded in
src/test/scala/graft/IndicatorGoldenSpec.scala."""
N = 200
def tri(t):
    p = t % 20
    return p if p < 10 else 20 - p
close = [100.0 + tri(t) * 0.7 + t * 0.03 for t in range(N)]
high  = [close[t] + 0.25 + ((t * 7) % 5) * 0.04 for t in range(N)]
low   = [close[t] - 0.3 - ((t * 3) % 4) * 0.05 for t in range(N)]

def talib_ema(xs, n):
    a = 2.0 / (n + 1); out = [None] * len(xs)
    s = sum(xs[:n]) / n; out[n-1] = s
    for t in range(n, len(xs)):
        s = a * xs[t] + (1 - a) * s; out[t] = s
    return out

def ours_ema(xs, n):
    a = 2.0 / (n + 1); s = xs[0]; out = [s]
    for x in xs[1:]: s = a * x + (1 - a) * s; out.append(s)
    return out

def talib_rsi(xs, n):
    diffs = [xs[i] - xs[i-1] for i in range(1, len(xs))]
    gains = [d if d > 0 else 0.0 for d in diffs]
    losses = [-d if d < 0 else 0.0 for d in diffs]
    ag = sum(gains[:n]) / n; al = sum(losses[:n]) / n
    out = [None] * len(xs)
    rsi = lambda ag, al: 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
    out[n] = rsi(ag, al)
    for t in range(n+1, len(xs)):
        ag = (ag * (n-1) + gains[t-1]) / n; al = (al * (n-1) + losses[t-1]) / n
        out[t] = rsi(ag, al)
    return out

def ours_rsi(xs, n):
    a = 1.0 / n; ag = al = None; out = [None] * len(xs)
    for t in range(1, len(xs)):
        d = xs[t] - xs[t-1]
        g = d if d > 0 else 0.0; l = -d if d < 0 else 0.0
        ag = g if ag is None else a * g + (1 - a) * ag
        al = l if al is None else a * l + (1 - a) * al
        out[t] = 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
    return out

def tr_series(h, l, c):
    return [h[0] - l[0]] + [max(h[t]-l[t], abs(h[t]-c[t-1]), abs(l[t]-c[t-1]))
                            for t in range(1, len(h))]

def talib_atr(h, l, c, n):
    tr = tr_series(h, l, c); s = sum(tr[1:n+1]) / n
    out = [None] * len(h); out[n] = s
    for t in range(n+1, len(h)):
        s = (s * (n-1) + tr[t]) / n; out[t] = s
    return out

def ours_atr(h, l, c, n):
    tr = tr_series(h, l, c); a = 1.0 / n; s = tr[0]; out = [s]
    for x in tr[1:]: s = a * x + (1 - a) * s; out.append(s)
    return out

def talib_sar(h, l, step=0.02, maxaf=0.2):
    out = [None] * len(h)
    mdm = l[0] - l[1]
    up = not (mdm > h[1] - h[0] and mdm > 0)
    af = step
    if up: sar, ep = l[0], h[1]
    else:  sar, ep = h[0], l[1]
    for t in range(1, len(h)):
        p2h = h[t-2] if t >= 2 else h[t-1]; p2l = l[t-2] if t >= 2 else l[t-1]
        if up:
            if l[t] < sar:
                up = False; sar = max(ep, h[t-1], p2h); out[t] = sar
                af = step; ep = l[t]
                sar = max(sar + af * (ep - sar), h[t-1], p2h)
            else:
                out[t] = sar
                if h[t] > ep: ep = h[t]; af = min(af + step, maxaf)
                sar = min(sar + af * (ep - sar), l[t-1], p2l)
        else:
            if h[t] > sar:
                up = True; sar = min(ep, l[t-1], p2l); out[t] = sar
                af = step; ep = h[t]
                sar = min(sar + af * (ep - sar), l[t-1], p2l)
            else:
                out[t] = sar
                if l[t] < ep: ep = l[t]; af = min(af + step, maxaf)
                sar = max(sar + af * (ep - sar), h[t-1], p2h)
    return out

def ours_sar(h, l, step=0.02, maxaf=0.2):
    out = [None] * len(h)
    up = True; sar = l[0]; ep = h[0]; af = step
    pl = pl2 = l[0]; ph = ph2 = h[0]
    for t in range(1, len(h)):
        sn = sar + af * (ep - sar)
        if up:
            sn = min(sn, pl, pl2)
            if l[t] < sn: up = False; sar = ep; ep = l[t]; af = step
            else:
                sar = sn
                if h[t] > ep: ep = h[t]; af = min(af + step, maxaf)
        else:
            sn = max(sn, ph, ph2)
            if h[t] > sn: up = True; sar = ep; ep = h[t]; af = step
            else:
                sar = sn
                if l[t] < ep: ep = l[t]; af = min(af + step, maxaf)
        out[t] = sar
        pl2, ph2 = pl, ph; pl, ph = l[t], h[t]
    return out

e_t, e_o = talib_ema(close, 5), ours_ema(close, 5)
r_t, r_o = talib_rsi(close, 14), ours_rsi(close, 14)
a_t, a_o = talib_atr(high, low, close, 14), ours_atr(high, low, close, 14)
s_t, s_o = talib_sar(high, low), ours_sar(high, low)

print("ema max|d| t>=150:", max(abs(e_t[t]-e_o[t]) for t in range(150, N)))
print("rsi max|d| t>=150:", max(abs(r_t[t]-r_o[t]) for t in range(150, N)))
print("atr max|d| t>=150:", max(abs(a_t[t]-a_o[t]) for t in range(150, N)))
first_eq = next((t for t in range(1, N) if all(abs(s_t[u]-s_o[u]) < 1e-12 for u in range(t, N))), None)
print("sar exact from t =", first_eq)
# margin safety: nearest decision boundary distance for SAR comparisons
idx = [160, 170, 180, 190, 199]
for name, s in [("ema5", e_t), ("rsi14", r_t), ("atr14", a_t), ("sar", s_t)]:
    print(name, ", ".join("%d -> %r" % (t, s[t]) for t in idx))

def talib_adx(h, l, c, n):
    trs, pdms, ndms = [], [], []
    for t in range(1, len(h)):
        up = h[t] - h[t-1]; dn = l[t-1] - l[t]
        pdms.append(up if (up > dn and up > 0) else 0.0)
        ndms.append(dn if (dn > up and dn > 0) else 0.0)
        trs.append(max(h[t]-l[t], abs(h[t]-c[t-1]), abs(l[t]-c[t-1])))
    st, sp, sn_ = sum(trs[:n]), sum(pdms[:n]), sum(ndms[:n])
    def dx(sp, sn_, st):
        pdi = 100*sp/st; ndi = 100*sn_/st
        return 0.0 if pdi + ndi == 0 else 100*abs(pdi-ndi)/(pdi+ndi)
    dxs = [dx(sp, sn_, st)]
    out = [None]*len(h); adx = None
    for t in range(n+1, len(h)):
        i = t - 1
        st = st - st/n + trs[i]; sp = sp - sp/n + pdms[i]
        sn_ = sn_ - sn_/n + ndms[i]
        d = dx(sp, sn_, st); dxs.append(d)
        if len(dxs) == n:
            adx = sum(dxs)/n; out[t] = adx
        elif len(dxs) > n:
            adx = (adx*(n-1) + d)/n; out[t] = adx
    return out

def ours_adx(h, l, c, n):
    # Wilder-MEAN smoothing seeded with the first value, matching
    # Indicators.withAdx: pdm/ndm/tr from bar 0 (bar 0: pdm=ndm=0, tr=h-l)
    a = 1.0/n
    strm = spdm = sndm = None
    dxsm = None
    out = [None]*len(h)
    for t in range(len(h)):
        if t == 0:
            pdm = ndm = 0.0; tr = h[0]-l[0]
        else:
            up = h[t]-h[t-1]; dn = l[t-1]-l[t]
            pdm = up if (up > dn and up > 0) else 0.0
            ndm = dn if (dn > up and dn > 0) else 0.0
            tr = max(h[t]-l[t], abs(h[t]-c[t-1]), abs(l[t]-c[t-1]))
        strm = tr if strm is None else a*tr + (1-a)*strm
        spdm = pdm if spdm is None else a*pdm + (1-a)*spdm
        sndm = ndm if sndm is None else a*ndm + (1-a)*sndm
        pdi = 100*spdm/strm if strm else 0.0
        ndi = 100*sndm/strm if strm else 0.0
        d = 0.0 if pdi + ndi == 0 else 100*abs(pdi-ndi)/(pdi+ndi)
        dxsm = d if dxsm is None else a*d + (1-a)*dxsm
        out[t] = dxsm
    return out

x_t = talib_adx(high, low, close, 14)
x_o = ours_adx(high, low, close, 14)
print("adx max|d| t>=160:", max(abs(x_t[t]-x_o[t]) for t in range(160, N)))
print("adx14", ", ".join("%d -> %r" % (t, x_t[t]) for t in [160, 170, 180, 190, 199]))
