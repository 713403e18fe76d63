// Minimal WebAssembly (MVP + sign-extension + bulk-memory subset)
// interpreter for circom witness generators.
//
// The reference runs circom's generated `main.wasm` inside wasmer 2.3
// (/root/reference/forks/circom-compat/src/witness/witness_calculator.rs:56)
// to compute circuit witnesses.  No wasm runtime ships in this image, so
// this file implements the small slice of wasm that circom's code generator
// emits: 32/64-bit integer arithmetic, linear memory, globals, direct and
// indirect calls, and structured control flow.  Floats are decoded but only
// the handful of ops circom can emit are implemented; anything else traps
// with a clear message rather than miscomputing.
//
// Host side (imports): the module's `runtime.*` imports follow the circom
// runtime ABI (witness_calculator.rs:74-90): `exceptionHandler(code)`
// aborts execution with the code recorded; the log/message hooks are
// no-ops.  `env.memory` is provided when imported (wasmer gives 2000 pages;
// we do the same and let memory.grow extend it).
//
// Exposed to Python through a tiny C ABI (see native/wasm_backend.py):
//   wvm_load / wvm_free / wvm_call / wvm_exception / wvm_error.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <map>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Trap {
    std::string msg;
    int64_t exception_code;  // >= 0 when raised via runtime.exceptionHandler
    explicit Trap(std::string m, int64_t code = -1)
        : msg(std::move(m)), exception_code(code) {}
};

struct Reader {
    const uint8_t* p;
    const uint8_t* end;
    const uint8_t* base;

    uint8_t u8() {
        if (p >= end) throw Trap("unexpected end of module");
        return *p++;
    }
    uint32_t u32leb() {
        uint32_t r = 0;
        int s = 0;
        for (;;) {
            uint8_t b = u8();
            r |= uint32_t(b & 0x7f) << s;
            if (!(b & 0x80)) return r;
            s += 7;
            if (s >= 35) throw Trap("u32 leb too long");
        }
    }
    int64_t s64leb() {
        int64_t r = 0;
        int s = 0;
        for (;;) {
            uint8_t b = u8();
            r |= int64_t(b & 0x7f) << s;
            s += 7;
            if (!(b & 0x80)) {
                if (s < 64 && (b & 0x40)) r |= -(int64_t(1) << s);
                return r;
            }
            if (s >= 70) throw Trap("s64 leb too long");
        }
    }
    int32_t s32leb() { return (int32_t)s64leb(); }
    uint64_t u64() {
        uint64_t v = 0;
        for (int i = 0; i < 8; i++) v |= uint64_t(u8()) << (8 * i);
        return v;
    }
    uint32_t u32raw() {
        uint32_t v = 0;
        for (int i = 0; i < 4; i++) v |= uint32_t(u8()) << (8 * i);
        return v;
    }
    std::string name() {
        uint32_t n = u32leb();
        if (p + n > end) throw Trap("name past end");
        std::string s((const char*)p, n);
        p += n;
        return s;
    }
    size_t off() const { return size_t(p - base); }
    void skip(size_t n) {
        if (p + n > end) throw Trap("skip past end");
        p += n;
    }
};

struct FuncType {
    std::vector<uint8_t> params, results;
};

// function results are marshalled through fixed uint64_t[ ] buffers in
// invoke/run_func/wvm_call; cap arity at parse time so a hostile module
// cannot overflow them (circom emits <= 1 result everywhere).
constexpr size_t MAX_RESULTS = 8;

struct FuncBody {
    uint32_t type_idx = 0;
    std::vector<uint8_t> local_types;  // expanded
    size_t code_begin = 0, code_end = 0;  // offsets into module bytes
    bool is_import = false;
    std::string import_mod, import_name;
};

struct Global {
    uint8_t type;
    uint64_t value;
};

struct Export {
    uint8_t kind;
    uint32_t index;
};

// control-flow side tables, built per function on first call
struct CtrlInfo {
    std::unordered_map<uint32_t, uint32_t> end_of;    // block/loop/if off -> end op off
    std::unordered_map<uint32_t, uint32_t> else_of;   // if off -> else op off (or 0)
};

struct Label {
    uint32_t cont;      // pc to jump to on br
    uint32_t stack_h;   // value-stack height at entry (below params)
    uint32_t arity;     // values carried on br
    bool is_loop;
};

struct VM {
    std::vector<uint8_t> bytes;
    std::vector<FuncType> types;
    std::vector<FuncBody> funcs;     // imports first
    std::vector<Global> globals;
    std::vector<uint32_t> table;     // funcref table
    std::vector<uint8_t> mem;
    uint32_t mem_pages_max = 65536;
    std::map<std::string, Export> exports;
    std::unordered_map<uint32_t, CtrlInfo> ctrl;   // per func index
    int64_t last_exception = -1;
    std::string last_error;
    uint32_t call_depth = 0;
    // instruction budget per wvm_call; a hostile/mutated module can loop
    // forever, so execution must be boundable (wvm_set_fuel)
    uint64_t fuel_limit = UINT64_MAX;
    uint64_t fuel = UINT64_MAX;

    Reader at(size_t off) const {
        Reader r{bytes.data() + off, bytes.data() + bytes.size(), bytes.data()};
        return r;
    }
};

constexpr uint8_t K_I32 = 0x7f, K_I64 = 0x7e, K_F32 = 0x7d, K_F64 = 0x7c;

uint32_t block_arity(VM& vm, int64_t bt, bool in_arity) {
    if (bt == -64) return 0;  // 0x40 empty
    if (bt < 0) return in_arity ? 0 : 1;  // single valtype
    const FuncType& ft = vm.types.at((size_t)bt);
    return in_arity ? (uint32_t)ft.params.size() : (uint32_t)ft.results.size();
}

// pre-scan a function body: match block/loop/if with else/end
void build_ctrl(VM& vm, uint32_t fidx) {
    const FuncBody& f = vm.funcs[fidx];
    CtrlInfo info;
    Reader r = vm.at(f.code_begin);
    const uint8_t* stop = vm.bytes.data() + f.code_end;
    std::vector<std::pair<uint32_t, uint8_t>> stack;  // (off, opcode)
    while (r.p < stop) {
        uint32_t off = (uint32_t)r.off();
        uint8_t op = r.u8();
        switch (op) {
            case 0x02: case 0x03: case 0x04:  // block/loop/if
                r.s64leb();                   // blocktype
                stack.push_back({off, op});
                break;
            case 0x05: {                      // else
                if (stack.empty()) throw Trap("else without if");
                info.else_of[stack.back().first] = off;
                break;
            }
            case 0x0b: {                      // end
                if (stack.empty()) { r.p = stop; break; }  // function end
                info.end_of[stack.back().first] = off;
                stack.pop_back();
                break;
            }
            case 0x0c: case 0x0d: r.u32leb(); break;        // br/br_if
            case 0x0e: {                                     // br_table
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i <= n; i++) r.u32leb();
                break;
            }
            case 0x10: r.u32leb(); break;                    // call
            case 0x11: r.u32leb(); r.u32leb(); break;        // call_indirect
            case 0x20: case 0x21: case 0x22: case 0x23: case 0x24:
                r.u32leb(); break;                           // local/global ops
            case 0x28: case 0x29: case 0x2a: case 0x2b: case 0x2c: case 0x2d:
            case 0x2e: case 0x2f: case 0x30: case 0x31: case 0x32: case 0x33:
            case 0x34: case 0x35: case 0x36: case 0x37: case 0x38: case 0x39:
            case 0x3a: case 0x3b: case 0x3c: case 0x3d: case 0x3e:
                r.u32leb(); r.u32leb(); break;               // mem ops: align+off
            case 0x3f: case 0x40: r.u8(); break;             // memory.size/grow
            case 0x1c: {                                     // typed select
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) r.u8();     // valtype vector
                break;
            }
            case 0x41: r.s64leb(); break;                    // i32.const
            case 0x42: r.s64leb(); break;                    // i64.const
            case 0x43: r.skip(4); break;                     // f32.const
            case 0x44: r.skip(8); break;                     // f64.const
            case 0xd0: r.u8(); break;                        // ref.null: type immediate
                // (runtime traps on execution; prescan must still skip the
                // immediate so offset tables stay in sync)
            case 0xfc: {                                     // prefix
                uint32_t sub = r.u32leb();
                if (sub == 10) { r.u8(); r.u8(); }           // memory.copy
                else if (sub == 11) { r.u8(); }              // memory.fill
                else if (sub <= 7) {}                        // trunc_sat
                else throw Trap("unsupported 0xfc subop in prescan");
                break;
            }
            default:
                if (op > 0xc4)
                    throw Trap("unknown opcode in prescan: " + std::to_string(op));
                break;  // all remaining ops have no immediates
        }
    }
    vm.ctrl.emplace(fidx, std::move(info));
}

void ensure_mem(VM& vm, uint64_t addr, uint64_t n) {
    if (addr + n > vm.mem.size()) throw Trap("out-of-bounds memory access");
}

uint64_t run_func(VM& vm, uint32_t fidx, const uint64_t* args, uint32_t nargs,
                  uint64_t* results, uint32_t* nresults);

// invoke either an import stub or a wasm function, used by call/call_indirect
void invoke(VM& vm, uint32_t fidx, std::vector<uint64_t>& stack) {
    if (fidx >= vm.funcs.size()) throw Trap("call index out of range");
    const FuncBody& f = vm.funcs[fidx];
    const FuncType& ft = vm.types.at(f.type_idx);
    uint32_t np = (uint32_t)ft.params.size();
    if (stack.size() < np) throw Trap("stack underflow at call");
    std::vector<uint64_t> args(stack.end() - np, stack.end());
    stack.resize(stack.size() - np);
    if (f.is_import) {
        if (f.import_name == "exceptionHandler") {
            int64_t code = np > 0 ? (int64_t)(int32_t)args[0] : -2;
            vm.last_exception = code;
            throw Trap("wasm exceptionHandler(" + std::to_string(code) + ")", code);
        }
        // Only the circom runtime ABI's log/message hooks may no-op
        // (witness_calculator.rs:76-86); any other host import would
        // silently compute a wrong witness, so trap instead.
        static const char* kRuntimeHooks[] = {
            "error", "log", "logSetSignal", "logGetSignal",
            "logStartComponent", "logFinishComponent",
            "showSharedRWMemory", "printErrorMessage", "writeBufferMessage",
        };
        bool known = f.import_mod == "runtime";
        if (known) {
            known = false;
            for (const char* h : kRuntimeHooks)
                if (f.import_name == h) { known = true; break; }
        }
        if (!known)
            throw Trap("unsupported host import " + f.import_mod + "." +
                       f.import_name);
        // log/message/error hooks: no-op, results (if any) are zero
        for (size_t i = 0; i < ft.results.size(); i++) stack.push_back(0);
        return;
    }
    uint64_t res[8];
    uint32_t nres = 0;
    run_func(vm, fidx, args.data(), np, res, &nres);
    for (uint32_t i = 0; i < nres; i++) stack.push_back(res[i]);
}

template <typename T>
T mem_load(VM& vm, uint64_t addr) {
    ensure_mem(vm, addr, sizeof(T));
    T v;
    std::memcpy(&v, vm.mem.data() + addr, sizeof(T));
    return v;
}

template <typename T>
void mem_store(VM& vm, uint64_t addr, T v) {
    ensure_mem(vm, addr, sizeof(T));
    std::memcpy(vm.mem.data() + addr, &v, sizeof(T));
}

uint64_t run_func(VM& vm, uint32_t fidx, const uint64_t* args, uint32_t nargs,
                  uint64_t* results, uint32_t* nresults) {
    if (++vm.call_depth > 20000) { vm.call_depth--; throw Trap("call stack exhausted"); }
    if (fidx >= vm.funcs.size()) throw Trap("function index out of range");
    const FuncBody& f = vm.funcs[fidx];
    const FuncType& ft = vm.types.at(f.type_idx);
    if (nargs != ft.params.size()) throw Trap("arg count mismatch");
    if (!vm.ctrl.count(fidx)) build_ctrl(vm, fidx);
    CtrlInfo& ci = vm.ctrl[fidx];

    std::vector<uint64_t> locals(ft.params.size() + f.local_types.size(), 0);
    for (uint32_t i = 0; i < nargs; i++) locals[i] = args[i];

    std::vector<uint64_t> stack;
    stack.reserve(64);
    // no validation pass runs before execution, so every stack access must
    // be checked — a malformed module underflowing the value stack must
    // trap, not corrupt memory
    auto pop = [&stack]() -> uint64_t {
        if (stack.empty()) throw Trap("value stack underflow");
        uint64_t v = stack.back();
        stack.pop_back();
        return v;
    };
    auto top = [&stack]() -> uint64_t& {
        if (stack.empty()) throw Trap("value stack underflow");
        return stack.back();
    };
    std::vector<Label> labels;
    labels.push_back({(uint32_t)f.code_end, 0, (uint32_t)ft.results.size(), false});

    Reader r = vm.at(f.code_begin);
    const uint8_t* code_end_p = vm.bytes.data() + f.code_end;

    auto do_branch = [&](uint32_t depth) {
        if (depth >= labels.size()) throw Trap("br depth out of range");
        Label& L = labels[labels.size() - 1 - depth];
        uint32_t arity = L.arity;
        if (stack.size() < arity || stack.size() < L.stack_h + arity)
            throw Trap("value stack underflow at br");
        // carry top `arity` values, reset stack to label height
        for (uint32_t i = 0; i < arity; i++)
            stack[L.stack_h + i] = stack[stack.size() - arity + i];
        stack.resize(L.stack_h + arity);
        r = vm.at(L.cont);
        // a br to a loop re-enters it (keep its label); a br to a block
        // exits it (drop its label too)
        labels.resize(labels.size() - depth - (L.is_loop ? 0 : 1));
    };

    for (;;) {
        if (r.p >= code_end_p) break;  // fell off the end = return
        if (--vm.fuel == 0) throw Trap("instruction budget exhausted");
        uint32_t off = (uint32_t)r.off();
        uint8_t op = r.u8();
        switch (op) {
            case 0x00: throw Trap("unreachable executed");
            case 0x01: break;  // nop
            case 0x02: {       // block
                int64_t bt = r.s64leb();
                uint32_t end = ci.end_of.at(off);
                labels.push_back({end + 1,
                                  (uint32_t)stack.size() - block_arity(vm, bt, true),
                                  block_arity(vm, bt, false), false});
                break;
            }
            case 0x03: {       // loop
                int64_t bt = r.s64leb();
                // continuation re-enters the BODY (past the blocktype), so a
                // br to this label must not re-push it
                labels.push_back({(uint32_t)r.off(),
                                  (uint32_t)stack.size() - block_arity(vm, bt, true),
                                  block_arity(vm, bt, true), true});
                break;
            }
            case 0x04: {       // if
                int64_t bt = r.s64leb();
                uint32_t end = ci.end_of.at(off);
                uint32_t cond = (uint32_t)pop();
                labels.push_back({end + 1,
                                  (uint32_t)stack.size() - block_arity(vm, bt, true),
                                  block_arity(vm, bt, false), false});
                if (!cond) {
                    auto it = ci.else_of.find(off);
                    if (it != ci.else_of.end()) r = vm.at(it->second + 1);
                    else { r = vm.at(end + 1); labels.pop_back(); }
                }
                break;
            }
            case 0x05: {       // else reached from the then-branch: jump to end
                if (labels.size() <= 1) throw Trap("else outside a block");
                r = vm.at(labels.back().cont);
                labels.pop_back();
                break;
            }
            case 0x0b: {       // end
                if (labels.size() > 1) labels.pop_back();
                else { r.p = code_end_p; }
                break;
            }
            case 0x0c: do_branch(r.u32leb()); break;  // br
            case 0x0d: {                              // br_if
                uint32_t d = r.u32leb();
                uint32_t c = (uint32_t)pop();
                if (c) do_branch(d);
                break;
            }
            case 0x0e: {                              // br_table
                uint32_t n = r.u32leb();
                std::vector<uint32_t> tgts(n);
                for (uint32_t i = 0; i < n; i++) tgts[i] = r.u32leb();
                uint32_t dflt = r.u32leb();
                uint32_t v = (uint32_t)pop();
                do_branch(v < n ? tgts[v] : dflt);
                break;
            }
            case 0x0f: {                              // return
                uint32_t arity = (uint32_t)ft.results.size();
                if (stack.size() < arity) throw Trap("stack underflow at return");
                for (uint32_t i = 0; i < arity; i++)
                    results[i] = stack[stack.size() - arity + i];
                *nresults = arity;
                vm.call_depth--;
                return 0;
            }
            case 0x10: invoke(vm, r.u32leb(), stack); break;  // call
            case 0x11: {                                      // call_indirect
                r.u32leb();  // type idx (unchecked)
                r.u8();      // table 0
                uint32_t ti = (uint32_t)pop();
                if (ti >= vm.table.size() || vm.table[ti] == UINT32_MAX ||
                    vm.table[ti] >= vm.funcs.size())
                    throw Trap("bad call_indirect index");
                invoke(vm, vm.table[ti], stack);
                break;
            }
            case 0x1a: pop(); break;                          // drop
            case 0x1b: case 0x1c: {                           // select
                if (op == 0x1c) { uint32_t n = r.u32leb(); for (uint32_t i = 0; i < n; i++) r.u8(); }
                uint32_t c = (uint32_t)pop();
                uint64_t b = pop();
                uint64_t a = pop();
                stack.push_back(c ? a : b);
                break;
            }
            case 0x20: stack.push_back(locals.at(r.u32leb())); break;
            case 0x21: locals.at(r.u32leb()) = pop(); break;
            case 0x22: locals.at(r.u32leb()) = top(); break;
            case 0x23: stack.push_back(vm.globals.at(r.u32leb()).value); break;
            case 0x24: vm.globals.at(r.u32leb()).value = pop(); break;

            // loads
            case 0x28: case 0x29: case 0x2a: case 0x2b: case 0x2c: case 0x2d:
            case 0x2e: case 0x2f: case 0x30: case 0x31: case 0x32: case 0x33:
            case 0x34: case 0x35: {
                r.u32leb();
                uint32_t memoff = r.u32leb();
                uint64_t a = (uint32_t)pop() + (uint64_t)memoff;
                uint64_t v;
                switch (op) {
                    case 0x28: v = mem_load<uint32_t>(vm, a); break;           // i32.load
                    case 0x29: v = mem_load<uint64_t>(vm, a); break;           // i64.load
                    case 0x2a: v = mem_load<uint32_t>(vm, a); break;           // f32.load (bits)
                    case 0x2b: v = mem_load<uint64_t>(vm, a); break;           // f64.load (bits)
                    case 0x2c: v = (uint32_t)(int32_t)(int8_t)mem_load<uint8_t>(vm, a); break;
                    case 0x2d: v = mem_load<uint8_t>(vm, a); break;
                    case 0x2e: v = (uint32_t)(int32_t)(int16_t)mem_load<uint16_t>(vm, a); break;
                    case 0x2f: v = mem_load<uint16_t>(vm, a); break;
                    case 0x30: v = (uint64_t)(int64_t)(int8_t)mem_load<uint8_t>(vm, a); break;
                    case 0x31: v = mem_load<uint8_t>(vm, a); break;
                    case 0x32: v = (uint64_t)(int64_t)(int16_t)mem_load<uint16_t>(vm, a); break;
                    case 0x33: v = mem_load<uint16_t>(vm, a); break;
                    case 0x34: v = (uint64_t)(int64_t)(int32_t)mem_load<uint32_t>(vm, a); break;
                    default:   v = mem_load<uint32_t>(vm, a); break;           // 0x35 i64.load32_u
                }
                stack.push_back(v);
                break;
            }
            // stores
            case 0x36: case 0x37: case 0x38: case 0x39: case 0x3a: case 0x3b:
            case 0x3c: case 0x3d: case 0x3e: {
                r.u32leb();
                uint32_t memoff = r.u32leb();
                uint64_t v = pop();
                uint64_t a = (uint32_t)pop() + (uint64_t)memoff;
                switch (op) {
                    case 0x36: mem_store<uint32_t>(vm, a, (uint32_t)v); break;
                    case 0x37: mem_store<uint64_t>(vm, a, v); break;
                    case 0x38: mem_store<uint32_t>(vm, a, (uint32_t)v); break; // f32
                    case 0x39: mem_store<uint64_t>(vm, a, v); break;           // f64
                    case 0x3a: mem_store<uint8_t>(vm, a, (uint8_t)v); break;
                    case 0x3b: mem_store<uint16_t>(vm, a, (uint16_t)v); break;
                    case 0x3c: mem_store<uint8_t>(vm, a, (uint8_t)v); break;
                    case 0x3d: mem_store<uint16_t>(vm, a, (uint16_t)v); break;
                    default:   mem_store<uint32_t>(vm, a, (uint32_t)v); break; // i64.store32
                }
                break;
            }
            case 0x3f: r.u8(); stack.push_back((uint32_t)(vm.mem.size() / 65536)); break;
            case 0x40: {  // memory.grow
                r.u8();
                uint32_t delta = (uint32_t)pop();
                uint64_t cur = vm.mem.size() / 65536;
                uint64_t want = cur + delta;
                if (want > vm.mem_pages_max || want > 65536) stack.push_back((uint32_t)-1);
                else { vm.mem.resize(want * 65536, 0); stack.push_back((uint32_t)cur); }
                break;
            }
            case 0x41: stack.push_back((uint32_t)(int32_t)r.s64leb()); break;
            case 0x42: stack.push_back((uint64_t)r.s64leb()); break;
            case 0x43: stack.push_back(r.u32raw()); break;
            case 0x44: stack.push_back(r.u64()); break;

            default: {
                // numeric ops without immediates (checked `pop` from above)
                auto push32 = [&](uint32_t v) { stack.push_back(v); };
                auto push64 = [&](uint64_t v) { stack.push_back(v); };
                if (op >= 0x45 && op <= 0x4f) {  // i32 compare
                    if (op == 0x45) { push32(pop() ? 0 : 1); break; }  // eqz (wait: i32.eqz pops one)
                    uint32_t b = (uint32_t)pop(), a = (uint32_t)pop();
                    int32_t sa = (int32_t)a, sb = (int32_t)b;
                    uint32_t v = 0;
                    switch (op) {
                        case 0x46: v = a == b; break; case 0x47: v = a != b; break;
                        case 0x48: v = sa < sb; break; case 0x49: v = a < b; break;
                        case 0x4a: v = sa > sb; break; case 0x4b: v = a > b; break;
                        case 0x4c: v = sa <= sb; break; case 0x4d: v = a <= b; break;
                        case 0x4e: v = sa >= sb; break; default: v = a >= b; break;
                    }
                    push32(v);
                    break;
                }
                if (op == 0x50) { push32(pop() == 0); break; }  // i64.eqz
                if (op >= 0x51 && op <= 0x5a) {  // i64 compare
                    uint64_t b = pop(), a = pop();
                    int64_t sa = (int64_t)a, sb = (int64_t)b;
                    uint32_t v = 0;
                    switch (op) {
                        case 0x51: v = a == b; break; case 0x52: v = a != b; break;
                        case 0x53: v = sa < sb; break; case 0x54: v = a < b; break;
                        case 0x55: v = sa > sb; break; case 0x56: v = a > b; break;
                        case 0x57: v = sa <= sb; break; case 0x58: v = a <= b; break;
                        default: v = (op == 0x59) ? (sa >= sb) : (a >= b); break;
                    }
                    push32(v);
                    break;
                }
                switch (op) {
                    case 0x67: { uint32_t a = (uint32_t)pop(); push32(a ? __builtin_clz(a) : 32); break; }
                    case 0x68: { uint32_t a = (uint32_t)pop(); push32(a ? __builtin_ctz(a) : 32); break; }
                    case 0x69: { uint32_t a = (uint32_t)pop(); push32(__builtin_popcount(a)); break; }
                    case 0x6a: { uint32_t b = (uint32_t)pop(), a = (uint32_t)pop(); push32(a + b); break; }
                    case 0x6b: { uint32_t b = (uint32_t)pop(), a = (uint32_t)pop(); push32(a - b); break; }
                    case 0x6c: { uint32_t b = (uint32_t)pop(), a = (uint32_t)pop(); push32(a * b); break; }
                    case 0x6d: { int32_t b = (int32_t)pop(), a = (int32_t)pop();
                                 if (!b || (a == INT32_MIN && b == -1)) throw Trap("i32.div_s trap");
                                 push32((uint32_t)(a / b)); break; }
                    case 0x6e: { uint32_t b = (uint32_t)pop(), a = (uint32_t)pop();
                                 if (!b) throw Trap("i32.div_u by zero");
                                 push32(a / b); break; }
                    case 0x6f: { int32_t b = (int32_t)pop(), a = (int32_t)pop();
                                 if (!b) throw Trap("i32.rem_s by zero");
                                 push32((a == INT32_MIN && b == -1) ? 0 : (uint32_t)(a % b)); break; }
                    case 0x70: { uint32_t b = (uint32_t)pop(), a = (uint32_t)pop();
                                 if (!b) throw Trap("i32.rem_u by zero");
                                 push32(a % b); break; }
                    case 0x71: { uint32_t b = (uint32_t)pop(), a = (uint32_t)pop(); push32(a & b); break; }
                    case 0x72: { uint32_t b = (uint32_t)pop(), a = (uint32_t)pop(); push32(a | b); break; }
                    case 0x73: { uint32_t b = (uint32_t)pop(), a = (uint32_t)pop(); push32(a ^ b); break; }
                    case 0x74: { uint32_t b = (uint32_t)pop() & 31, a = (uint32_t)pop(); push32(a << b); break; }
                    case 0x75: { uint32_t b = (uint32_t)pop() & 31; int32_t a = (int32_t)pop(); push32((uint32_t)(a >> b)); break; }
                    case 0x76: { uint32_t b = (uint32_t)pop() & 31, a = (uint32_t)pop(); push32(a >> b); break; }
                    case 0x77: { uint32_t b = (uint32_t)pop() & 31, a = (uint32_t)pop();
                                 push32(b ? ((a << b) | (a >> (32 - b))) : a); break; }
                    case 0x78: { uint32_t b = (uint32_t)pop() & 31, a = (uint32_t)pop();
                                 push32(b ? ((a >> b) | (a << (32 - b))) : a); break; }
                    case 0x79: { uint64_t a = pop(); push64(a ? __builtin_clzll(a) : 64); break; }
                    case 0x7a: { uint64_t a = pop(); push64(a ? __builtin_ctzll(a) : 64); break; }
                    case 0x7b: { uint64_t a = pop(); push64(__builtin_popcountll(a)); break; }
                    case 0x7c: { uint64_t b = pop(), a = pop(); push64(a + b); break; }
                    case 0x7d: { uint64_t b = pop(), a = pop(); push64(a - b); break; }
                    case 0x7e: { uint64_t b = pop(), a = pop(); push64(a * b); break; }
                    case 0x7f: { int64_t b = (int64_t)pop(), a = (int64_t)pop();
                                 if (!b || (a == INT64_MIN && b == -1)) throw Trap("i64.div_s trap");
                                 push64((uint64_t)(a / b)); break; }
                    case 0x80: { uint64_t b = pop(), a = pop();
                                 if (!b) throw Trap("i64.div_u by zero");
                                 push64(a / b); break; }
                    case 0x81: { int64_t b = (int64_t)pop(), a = (int64_t)pop();
                                 if (!b) throw Trap("i64.rem_s by zero");
                                 push64((a == INT64_MIN && b == -1) ? 0 : (uint64_t)(a % b)); break; }
                    case 0x82: { uint64_t b = pop(), a = pop();
                                 if (!b) throw Trap("i64.rem_u by zero");
                                 push64(a % b); break; }
                    case 0x83: { uint64_t b = pop(), a = pop(); push64(a & b); break; }
                    case 0x84: { uint64_t b = pop(), a = pop(); push64(a | b); break; }
                    case 0x85: { uint64_t b = pop(), a = pop(); push64(a ^ b); break; }
                    case 0x86: { uint64_t b = pop() & 63, a = pop(); push64(a << b); break; }
                    case 0x87: { uint64_t b = pop() & 63; int64_t a = (int64_t)pop(); push64((uint64_t)(a >> b)); break; }
                    case 0x88: { uint64_t b = pop() & 63, a = pop(); push64(a >> b); break; }
                    case 0x89: { uint64_t b = pop() & 63, a = pop();
                                 push64(b ? ((a << b) | (a >> (64 - b))) : a); break; }
                    case 0x8a: { uint64_t b = pop() & 63, a = pop();
                                 push64(b ? ((a >> b) | (a << (64 - b))) : a); break; }
                    case 0xa7: { push32((uint32_t)pop()); break; }              // i32.wrap_i64
                    case 0xac: { push64((uint64_t)(int64_t)(int32_t)(uint32_t)pop()); break; }  // i64.extend_i32_s
                    case 0xad: { push64((uint32_t)pop()); break; }              // i64.extend_i32_u
                    case 0xc0: { push32((uint32_t)(int32_t)(int8_t)(uint8_t)pop()); break; }
                    case 0xc1: { push32((uint32_t)(int32_t)(int16_t)(uint16_t)pop()); break; }
                    case 0xc2: { push64((uint64_t)(int64_t)(int8_t)(uint8_t)pop()); break; }
                    case 0xc3: { push64((uint64_t)(int64_t)(int16_t)(uint16_t)pop()); break; }
                    case 0xc4: { push64((uint64_t)(int64_t)(int32_t)(uint32_t)pop()); break; }
                    case 0xfc: {
                        uint32_t sub = r.u32leb();
                        if (sub == 10) {  // memory.copy
                            r.u8(); r.u8();
                            uint64_t n = (uint32_t)pop(), s = (uint32_t)pop(), d = (uint32_t)pop();
                            ensure_mem(vm, s, n); ensure_mem(vm, d, n);
                            std::memmove(vm.mem.data() + d, vm.mem.data() + s, n);
                        } else if (sub == 11) {  // memory.fill
                            r.u8();
                            uint64_t n = (uint32_t)pop(), v = (uint32_t)pop(), d = (uint32_t)pop();
                            ensure_mem(vm, d, n);
                            std::memset(vm.mem.data() + d, (int)v, n);
                        } else {
                            throw Trap("unsupported 0xfc op " + std::to_string(sub));
                        }
                        break;
                    }
                    default:
                        throw Trap("unsupported opcode 0x" + [&]{ char b[8]; snprintf(b, 8, "%02x", op); return std::string(b); }());
                }
            }
        }
    }
    uint32_t arity = (uint32_t)ft.results.size();
    if (stack.size() < arity) throw Trap("stack underflow at function end");
    for (uint32_t i = 0; i < arity; i++)
        results[i] = stack[stack.size() - arity + i];
    *nresults = arity;
    vm.call_depth--;
    return 0;
}

void parse_module(VM& vm) {
    Reader r = vm.at(0);
    if (r.u32raw() != 0x6d736100 || r.u32raw() != 1) throw Trap("bad wasm header");
    std::vector<uint32_t> func_type_idx;
    std::vector<std::pair<uint8_t, bool>> global_decls;
    uint32_t mem_min_pages = 0;
    bool mem_imported = false;
    while (r.p < r.end) {
        uint8_t sec = r.u8();
        uint32_t len = r.u32leb();
        const uint8_t* sec_end = r.p + len;
        if (len > size_t(r.end - r.p)) throw Trap("section length past end");
        switch (sec) {
            case 1: {  // types
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) {
                    if (r.u8() != 0x60) throw Trap("bad functype");
                    FuncType ft;
                    uint32_t np = r.u32leb();
                    for (uint32_t j = 0; j < np; j++) ft.params.push_back(r.u8());
                    uint32_t nr = r.u32leb();
                    if (nr > MAX_RESULTS)
                        throw Trap("function type with >8 results rejected");
                    for (uint32_t j = 0; j < nr; j++) ft.results.push_back(r.u8());
                    vm.types.push_back(std::move(ft));
                }
                break;
            }
            case 2: {  // imports
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) {
                    std::string mod = r.name(), nm = r.name();
                    uint8_t kind = r.u8();
                    if (kind == 0) {
                        FuncBody fb;
                        fb.type_idx = r.u32leb();
                        fb.is_import = true;
                        fb.import_mod = mod;
                        fb.import_name = nm;
                        vm.funcs.push_back(std::move(fb));
                    } else if (kind == 2) {  // memory import (env.memory)
                        uint8_t flags = r.u8();
                        uint32_t mn = r.u32leb();
                        if (flags & 1) r.u32leb();
                        // wasmer hands circom 2000 pages; honor the larger
                        mem_min_pages = mn > 2000 ? mn : 2000;
                        mem_imported = true;
                    } else if (kind == 1) {  // table import
                        r.u8(); uint8_t flags = r.u8(); r.u32leb();
                        if (flags & 1) r.u32leb();
                    } else if (kind == 3) {  // global import
                        r.u8(); r.u8();
                        vm.globals.push_back({K_I32, 0});
                    } else throw Trap("bad import kind");
                }
                break;
            }
            case 3: {  // functions
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) func_type_idx.push_back(r.u32leb());
                break;
            }
            case 4: {  // table
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) {
                    r.u8();  // elemtype 0x70
                    uint8_t flags = r.u8();
                    uint32_t mn = r.u32leb();
                    if (flags & 1) r.u32leb();
                    vm.table.assign(mn, UINT32_MAX);
                }
                break;
            }
            case 5: {  // memory
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) {
                    uint8_t flags = r.u8();
                    uint32_t mn = r.u32leb();
                    if (flags & 1) r.u32leb();
                    if (!mem_imported) mem_min_pages = mn;
                }
                break;
            }
            case 6: {  // globals
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) {
                    uint8_t t = r.u8();
                    r.u8();  // mutability
                    // init expr: const then end
                    uint8_t opc = r.u8();
                    uint64_t v = 0;
                    if (opc == 0x41) v = (uint32_t)(int32_t)r.s64leb();
                    else if (opc == 0x42) v = (uint64_t)r.s64leb();
                    else if (opc == 0x43) v = r.u32raw();
                    else if (opc == 0x44) v = r.u64();
                    else throw Trap("unsupported global init");
                    if (r.u8() != 0x0b) throw Trap("bad global init end");
                    vm.globals.push_back({t, v});
                }
                break;
            }
            case 7: {  // exports
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) {
                    std::string nm = r.name();
                    uint8_t kind = r.u8();
                    uint32_t idx = r.u32leb();
                    vm.exports[nm] = {kind, idx};
                }
                break;
            }
            case 9: {  // elements
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) {
                    uint32_t flags = r.u32leb();
                    if (flags != 0) throw Trap("unsupported element segment kind");
                    if (r.u8() != 0x41) throw Trap("bad elem offset expr");
                    uint32_t base = (uint32_t)(int32_t)r.s32leb();
                    if (r.u8() != 0x0b) throw Trap("bad elem offset end");
                    uint32_t cnt = r.u32leb();
                    if (base + cnt > vm.table.size()) vm.table.resize(base + cnt, UINT32_MAX);
                    for (uint32_t j = 0; j < cnt; j++) vm.table[base + j] = r.u32leb();
                }
                break;
            }
            case 10: {  // code
                uint32_t n = r.u32leb();
                uint32_t nimp = 0;
                for (auto& fb : vm.funcs) if (fb.is_import) nimp++;
                for (uint32_t i = 0; i < n; i++) {
                    uint32_t size = r.u32leb();
                    const uint8_t* body_end = r.p + size;
                    FuncBody fb;
                    fb.type_idx = func_type_idx.at(i);
                    uint32_t nloc = r.u32leb();
                    for (uint32_t j = 0; j < nloc; j++) {
                        uint32_t cnt = r.u32leb();
                        uint8_t t = r.u8();
                        for (uint32_t k = 0; k < cnt; k++) fb.local_types.push_back(t);
                    }
                    fb.code_begin = r.off();
                    fb.code_end = size_t(body_end - vm.bytes.data());
                    vm.funcs.push_back(std::move(fb));
                    r.p = body_end;
                }
                (void)nimp;
                break;
            }
            case 11: {  // data
                uint32_t n = r.u32leb();
                for (uint32_t i = 0; i < n; i++) {
                    uint32_t flags = r.u32leb();
                    if (flags != 0) throw Trap("unsupported data segment kind");
                    if (r.u8() != 0x41) throw Trap("bad data offset expr");
                    uint32_t base = (uint32_t)(int32_t)r.s32leb();
                    if (r.u8() != 0x0b) throw Trap("bad data offset end");
                    uint32_t cnt = r.u32leb();
                    ensure_mem(vm, base, cnt);
                    std::memcpy(vm.mem.data() + base, r.p, cnt);
                    r.skip(cnt);
                }
                break;
            }
            default:
                r.p = sec_end;  // custom/unknown sections skipped
        }
        if (r.p != sec_end) throw Trap("section length mismatch (id " + std::to_string(sec) + ")");
        if (sec == 5 || sec == 2) {
            if (vm.mem.empty() && mem_min_pages)
                vm.mem.assign((size_t)mem_min_pages * 65536, 0);
        }
    }
    if (vm.mem.empty() && mem_min_pages)
        vm.mem.assign((size_t)mem_min_pages * 65536, 0);
    // post-parse index validation: everything the runtime dereferences
    // unchecked must be range-checked here (mutated modules reach this code)
    for (const auto& fb : vm.funcs)
        if (fb.type_idx >= vm.types.size())
            throw Trap("function type index out of range");
    for (const auto& kv : vm.exports)
        if (kv.second.kind == 0 && kv.second.index >= vm.funcs.size())
            throw Trap("export function index out of range");
    for (uint32_t t : vm.table)
        if (t != UINT32_MAX && t >= vm.funcs.size())
            throw Trap("table element index out of range");
}

}  // namespace

extern "C" {

void* wvm_load(const uint8_t* bytes, uint64_t len, char* err, uint64_t errlen) {
    auto vm = std::make_unique<VM>();
    vm->bytes.assign(bytes, bytes + len);
    try {
        parse_module(*vm);
    } catch (const Trap& t) {
        if (err && errlen) snprintf(err, errlen, "%s", t.msg.c_str());
        return nullptr;
    } catch (const std::exception& e) {
        // malformed modules can drive .at()/allocations into out_of_range/
        // bad_alloc; report instead of letting it abort the host process
        if (err && errlen) snprintf(err, errlen, "parse error: %s", e.what());
        return nullptr;
    }
    return vm.release();
}

void wvm_free(void* h) { delete (VM*)h; }

// returns number of results, or -1 on trap/error
int32_t wvm_call(void* h, const char* name, const uint64_t* args, int32_t nargs,
                 uint64_t* out, int32_t nout, char* err, uint64_t errlen) {
    VM& vm = *(VM*)h;
    auto it = vm.exports.find(name);
    if (it == vm.exports.end() || it->second.kind != 0) {
        if (err && errlen) snprintf(err, errlen, "no exported function '%s'", name);
        return -1;
    }
    try {
        uint64_t res[8];
        uint32_t nres = 0;
        std::vector<uint64_t> a(args, args + nargs);
        vm.call_depth = 0;
        vm.fuel = vm.fuel_limit;
        run_func(vm, it->second.index, a.data(), (uint32_t)nargs, res, &nres);
        for (uint32_t i = 0; i < nres && (int32_t)i < nout; i++) out[i] = res[i];
        return (int32_t)nres;
    } catch (const Trap& t) {
        vm.last_error = t.msg;
        if (t.exception_code >= 0) vm.last_exception = t.exception_code;
        if (err && errlen) snprintf(err, errlen, "%s", t.msg.c_str());
        return -1;
    } catch (const std::exception& e) {
        vm.last_error = e.what();
        if (err && errlen) snprintf(err, errlen, "runtime error: %s", e.what());
        return -1;
    }
}

int64_t wvm_exception(void* h) { return ((VM*)h)->last_exception; }

// bound the per-call instruction budget (0 = unlimited)
void wvm_set_fuel(void* h, uint64_t fuel) {
    ((VM*)h)->fuel_limit = fuel ? fuel : UINT64_MAX;
}

uint64_t wvm_mem_size(void* h) { return ((VM*)h)->mem.size(); }

int32_t wvm_mem_read(void* h, uint64_t addr, uint8_t* dst, uint64_t n) {
    VM& vm = *(VM*)h;
    if (addr + n > vm.mem.size()) return -1;
    std::memcpy(dst, vm.mem.data() + addr, n);
    return 0;
}

}  // extern "C"
