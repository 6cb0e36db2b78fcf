// The reference sources use `void main`; we rename it via -Dmain=ref_main
// and provide the real entry point here.
void ref_main(int argc, char** argv);
int main(int argc, char** argv) { ref_main(argc, argv); return 0; }
